"""Fused joint-embedding Pallas kernel.

The joint view's embedding (ref MMBertEmbedding.py:57-72) is
``LayerNorm(concat_seq(text_embeddings, relu(W.pair_feats + b)))``.
XLA fuses the elementwise pieces but still materializes the projection and
the concatenation in HBM before the LayerNorm; this kernel produces the
final [2L, H] rows in one VMEM-resident pass per batch element:

  * rows [0, L):  LayerNorm(text_embeddings[i])
  * rows [L, 2L): LayerNorm(relu(feats[i] @ W + b))   (MXU matmul in-kernel)

Backward recomputes with the XLA reference implementation (exact, cheap at
these shapes) via custom_vjp, mirroring ops/attention.py's approach.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(text_ref, feats_ref, w_ref, b_ref, scale_ref, bias_ref, out_ref,
            *, eps: float):
    text = text_ref[0].astype(jnp.float32)           # [L, H]
    feats = feats_ref[0].astype(jnp.float32)         # [L, D]
    w = w_ref[:].astype(jnp.float32)                 # [D, H]
    b = b_ref[0].astype(jnp.float32)                 # [H]
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)

    proj = jnp.maximum(
        jnp.dot(feats, w, preferred_element_type=jnp.float32) + b, 0.0)

    def ln(x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias

    l = text.shape[0]
    out_ref[0, :l, :] = ln(text).astype(out_ref.dtype)
    out_ref[0, l:, :] = ln(proj).astype(out_ref.dtype)


def _fused_forward(text_emb, feats, w, b, scale, bias, eps, interpret):
    bsz, l, h = text_emb.shape
    lp, d = feats.shape[1], feats.shape[-1]  # lp == l unless frame-level
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((bsz, l + lp, h), text_emb.dtype),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, l, h), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((d, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, l + lp, h), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(text_emb, feats, w, b[None, :], scale[None, :], bias[None, :])


def _ref_forward(text_emb, feats, w, b, scale, bias, eps):
    dtype = text_emb.dtype
    proj = jax.nn.relu(
        jnp.dot(feats.astype(dtype), w.astype(dtype),
                preferred_element_type=dtype) + b.astype(dtype))
    x = jnp.concatenate([text_emb, proj], axis=1).astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


# Per-program VMEM ceiling for the whole-[L+Lp, H] block: measured scoped
# usage on v5e is ~6.5 KB/row at H=1024 (S=2048 compiles at ~13 MB; S=4096
# wants 26.3 MB against the 16 MB limit).  Past this the XLA reference
# path runs instead -- at those lengths the joint embed is a sliver of the
# step and XLA's fusion is fine.
_MAX_FUSED_ROWS = 2048


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_joint_embed(text_emb, feats, w, b, scale, bias, eps=1e-12,
                      interpret=False):
    """[B, L, H] text embeddings + [B, Lp, D] frames -> [B, L+Lp, H].

    ``interpret=True`` runs the Pallas kernel in interpret mode (CPU
    testing); resolve on the host, never sniffed at trace time.
    """
    if text_emb.shape[1] + feats.shape[1] > _MAX_FUSED_ROWS:
        return _ref_forward(text_emb, feats, w, b, scale, bias, eps)
    return _fused_forward(text_emb, feats, w, b, scale, bias, eps, interpret)


def _fwd(text_emb, feats, w, b, scale, bias, eps, interpret):
    if text_emb.shape[1] + feats.shape[1] > _MAX_FUSED_ROWS:
        out = _ref_forward(text_emb, feats, w, b, scale, bias, eps)
    else:
        out = _fused_forward(text_emb, feats, w, b, scale, bias, eps,
                             interpret)
    return out, (text_emb, feats, w, b, scale, bias)


def _bwd(eps, interpret, res, g):
    text_emb, feats, w, b, scale, bias = res
    _, vjp = jax.vjp(
        lambda *a: _ref_forward(*a, eps), text_emb, feats, w, b, scale, bias)
    return vjp(g)


fused_joint_embed.defvjp(_fwd, _bwd)
