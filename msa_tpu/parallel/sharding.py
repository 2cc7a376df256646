"""Parameter partition specs (GSPMD) for MMBert.

Tensor-parallel layout (Megatron-style, expressed purely as shardings --
XLA inserts the collectives over ICI):

  * q/k/v kernels column-sharded over ``model`` (attention heads split);
  * attention output kernel row-sharded (psum after);
  * FFN wi column-sharded, wo row-sharded;
  * word-embedding table vocab-sharded (the tied MLM decoder matmul then
    computes a vocab shard per device; the CE logsumexp reduces with a psum
    GSPMD derives automatically);
  * everything else (LayerNorms, pooler, fusion/CPC heads, biases on
    row-sharded outputs) replicated.

The reference has no parallelism of any kind (SURVEY.md section 2.3); this
module is new first-class scope.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def _spec_for(path: str, ndim: int) -> P:
    """Partition spec from a '/'-joined param path."""
    m = MODEL_AXIS
    if "embeddings/word" in path:
        return P(m, None)
    if path.endswith("ascale"):
        # static activation scale: [L] per-layer scalar (ops/quant.py) --
        # replicated (the q/k/v column-shard rule below must not split it)
        return P()
    if "layers/q/" in path or "layers/k/" in path or "layers/v/" in path or "layers/wi/" in path:
        # stacked [L, in, out] kernels / [L, out] biases: shard the out dim
        return P(*([None] * (ndim - 1) + [m]))
    if ("layers/o/" in path or "layers/wo/" in path) and path.endswith("kernel"):
        # stacked [L, in, out]: shard the in (contracting) dim
        return P(None, m, None)
    if path.endswith("decoder_bias"):
        return P(m)
    return P(*([None] * 0))  # replicated


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Pytree of PartitionSpecs matching ``params``."""
    def f(path, leaf):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        return _spec_for(p, leaf.ndim)

    return jax.tree_util.tree_map_with_path(f, params)


def param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), param_specs(params))


def batch_specs(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Shard every batch array on its leading (batch) axis."""
    return jax.tree.map(lambda x: P(DATA_AXIS), batch)


def shard_params(params, mesh: Mesh):
    """Place (and lay out) params on the mesh."""
    return jax.device_put(params, param_shardings(params, mesh))
