"""Multi-head attention: XLA reference path + Pallas TPU flash kernel.

The reference delegates all attention math to HF ``BertEncoder`` CUDA kernels
(ref MMBertForPretraining.py:270-276).  Here the hot path is ours:

  * ``_xla_attention``: einsum attention; XLA fuses mask-add + softmax.  With
    BERT-style attention-probs dropout active this is the training path.
  * ``_flash_attention``: blockwise online-softmax Pallas kernel that never
    materializes the [S, S] score matrix.  Bias is a key-padding additive mask
    [B, S] (the text||pair concat layout of ref MMBertForPretraining.py:246-250
    reduces to exactly this).  Full Pallas backward (dq + dk/dv kernels, P
    recomputed from the saved logsumexp), in-kernel attention dropout (TPU
    PRNG, mask regenerated in backward).  Matmuls run in the storage dtype
    (bf16 -> full-rate MXU) with f32 accumulation and f32 softmax stats;
    measured on v5e at 512-blocks: fwd+bwd beats XLA from S=1024 and is 3x
    faster at S=4096 (BENCH.md).

Dispatch:  ``use_flash`` in {"auto", "always", "never"}.  "auto" picks the
kernel on TPU when attention dropout is inactive and the sequence is long
enough for blockwise execution to beat one fused XLA softmax.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = -1e9
# Below this, XLA's fused attention wins on v5e (measured: XLA faster at
# S<=512, parity-to-faster for flash at S>=1024; flash additionally never
# materializes the [B,N,S,S] buffer, which is what matters at scale).
_FLASH_MIN_SEQ = 1024
# At or below this, the whole-sequence short_attention kernel dispatches
# (natural-layout, zero HBM intermediates -- the MSA S=40/80 hot path).
_SHORT_MAX_SEQ = 512
# Flash kernel block sizes (q / kv).  512x512 won the generic S>=1024
# sweep (BENCH.md round 2); module-level so bench harnesses can A/B them
# per workload (benchmarks/bench_frame_level.py).
_FLASH_BQ = 512
_FLASH_BK = 512
# Dispatch the natural-layout lane-packed flash kernel (ops/flash2.py) for
# long sequences instead of the head-split one below.  False = the original
# [B,N,S,D] kernel (kept for A/B and as the reference implementation).
_USE_FLASH2 = True


def default_on_tpu() -> bool:
    """HOST-side platform resolution for the ``on_tpu`` arguments below.

    Call this once outside jit (Trainer.__init__, a CLI, a bench harness)
    and thread the result in.  It must NOT be called inside traced model
    code: the default backend is the wrong answer under mixed backends or
    when tracing for a non-default device (round-1 VERDICT item 9).
    """
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - no backend available
        return False


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------

def _xla_attention(
    q: jnp.ndarray,  # [B, S, N, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # [B, 1, 1, S] additive
    dropout_rate: float,
    dropout_rng: Optional[jax.Array],
    deterministic: bool,
) -> jnp.ndarray:
    dtype = q.dtype
    depth = q.shape[-1]
    scale = 1.0 / math.sqrt(depth)
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    scores = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32,
                        precision=prec)
    scores = scores * scale + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if not deterministic and dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs.astype(dtype), v,
                     preferred_element_type=dtype, precision=prec)
    return ctx


# ---------------------------------------------------------------------------
# Pallas flash kernel
# ---------------------------------------------------------------------------

def _keep_mask(seed_ref, tile_id: jnp.ndarray, shape, rate: float):
    """Deterministic per-tile dropout keep-mask from the Pallas TPU PRNG.

    Seeding with (base_seed, tile_id) makes the mask reproducible in the
    backward kernels -- the whole point: no [B,N,S,S] mask is ever stored.
    Shared with the short/flash2 kernels (ops/short_attention.py): rates
    quantized to t/256 take the 4-decisions-per-u32-draw fast path there.
    """
    from .short_attention import _keep_mask as _km

    return _km(seed_ref, tile_id, shape, rate)


def _tile_id(i, j, r, kb, n_heads, n_qb, n_kb):
    return ((i * n_heads + j) * n_qb + r) * n_kb + kb


def _flash_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                  *, kv_block: int, scale: float, dropout_rate: float):
    """One (batch, head, q-block) program: online softmax over key blocks.

    Block shapes: q_ref [1,1,BQ,D]; k_ref/v_ref [1,1,S,D]; bias_ref [1,1,S]
    (the singleton keeps the trailing two block dims TPU-tileable);
    o_ref [1,1,BQ,D]; lse_ref [1,1,1,BQ] (row logsumexp, consumed by the
    backward kernels).  seed_ref [1] int32 in SMEM drives in-kernel
    attention-probs dropout when dropout_rate > 0 (dropout applies AFTER
    softmax normalization: l accumulates undropped p, acc accumulates
    masked p, final out = acc / (l * (1 - rate)) -- torch semantics).
    """
    # Matmuls run in the STORAGE dtype (bf16 in production -> full-rate MXU;
    # f32 in the CPU interpret tests -> exact) with f32 accumulation; all
    # softmax statistics stay f32.
    q = q_ref[0, 0]
    bq, d = q.shape
    s_total = k_ref.shape[2]
    num_kb = s_total // kv_block
    i, j, r = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_heads, n_qb = pl.num_programs(1), pl.num_programs(2)

    def body(kb_idx, carry):
        acc, m, l = carry
        start = kb_idx * kv_block
        kb = k_ref[0, 0, pl.ds(start, kv_block), :]
        vb = v_ref[0, 0, pl.ds(start, kv_block), :]
        b = bias_ref[0, 0, pl.ds(start, kv_block)].astype(jnp.float32)
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32) * scale \
            + b[None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref,
                              _tile_id(i, j, r, kb_idx, n_heads, n_qb, num_kb),
                              p.shape, dropout_rate)
            p = jnp.where(keep, p, 0.0)
        acc = acc * alpha + jnp.dot(p.astype(vb.dtype), vb,
                                    preferred_element_type=jnp.float32)
        return acc, m_new, l

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    l_safe = jnp.maximum(l, 1e-30)
    if dropout_rate > 0.0:
        acc = acc / (1.0 - dropout_rate)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0, 0] = (m[:, 0] + jnp.log(l_safe[:, 0])).astype(jnp.float32)


def _flash_dq_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref,
                     lse_ref, dq_ref, *, kv_block: int, scale: float,
                     dropout_rate: float):
    """dQ for one (batch, head, q-block): recompute P from saved logsumexp.

    dS = P * (M o dO V^T / (1-rate) - rowsum(dO*O));  dQ = scale * dS K.
    The dropout mask M is regenerated from (seed, tile_id) -- identical to
    the forward's by construction.
    """
    q = q_ref[0, 0]
    do = do_ref[0, 0]
    delta = jnp.sum(do_ref[0, 0].astype(jnp.float32)
                    * o_ref[0, 0].astype(jnp.float32), axis=-1, keepdims=True)
    lse = lse_ref[0, 0, 0].astype(jnp.float32)[:, None]
    bq, d = q.shape
    num_kb = k_ref.shape[2] // kv_block
    i, j, r = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_heads, n_qb = pl.num_programs(1), pl.num_programs(2)

    def body(kb_idx, dq):
        start = kb_idx * kv_block
        kb = k_ref[0, 0, pl.ds(start, kv_block), :]
        vb = v_ref[0, 0, pl.ds(start, kv_block), :]
        b = bias_ref[0, 0, pl.ds(start, kv_block)].astype(jnp.float32)
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32) * scale \
            + b[None, :]
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, vb.T, preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref,
                              _tile_id(i, j, r, kb_idx, n_heads, n_qb, num_kb),
                              dp.shape, dropout_rate)
            dp = jnp.where(keep, dp, 0.0) / (1.0 - dropout_rate)
        ds = (p * (dp - delta)).astype(kb.dtype)
        return dq + jnp.dot(ds, kb, preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _flash_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref,
                      lse_ref, dk_ref, dv_ref, *, q_block: int, scale: float,
                      dropout_rate: float):
    """dK/dV for one (batch, head, k-block): loop over q blocks."""
    kb = k_ref[0, 0]
    vb = v_ref[0, 0]
    b = bias_ref[0, 0].astype(jnp.float32)
    bk, d = kb.shape
    num_qb = q_ref.shape[2] // q_block
    i, j, kb_idx = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_heads = pl.num_programs(1)
    num_kb = pl.num_programs(2)

    def body(qb_idx, carry):
        dk, dv = carry
        start = qb_idx * q_block
        qb = q_ref[0, 0, pl.ds(start, q_block), :]
        dob = do_ref[0, 0, pl.ds(start, q_block), :]
        ob = o_ref[0, 0, pl.ds(start, q_block), :]
        lse = lse_ref[0, 0, 0, pl.ds(start, q_block)].astype(jnp.float32)[:, None]
        s = jnp.dot(qb, kb.T, preferred_element_type=jnp.float32) * scale \
            + b[None, :]
        p = jnp.exp(s - lse)                      # [BQ, BK] f32
        delta = jnp.sum(dob.astype(jnp.float32) * ob.astype(jnp.float32),
                        axis=-1, keepdims=True)
        dp = jnp.dot(dob, vb.T, preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref,
                              _tile_id(i, j, qb_idx, kb_idx, n_heads, num_qb,
                                       num_kb),
                              p.shape, dropout_rate)
            inv = 1.0 / (1.0 - dropout_rate)
            dv = dv + jnp.dot(jnp.where(keep, p, 0.0).astype(dob.dtype).T, dob,
                              preferred_element_type=jnp.float32) * inv
            dp = jnp.where(keep, dp, 0.0) * inv
        else:
            dv = dv + jnp.dot(p.astype(dob.dtype).T, dob,
                              preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(qb.dtype)
        dk = dk + jnp.dot(ds.T, qb, preferred_element_type=jnp.float32) * scale
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_attention(q, k, v, key_bias, seed=None, q_block=128, kv_block=128,
                     dropout_rate=0.0, interpret=False):
    """seed: [1] int32 array driving in-kernel attention dropout (TPU only);
    pass None / rate 0 for the deterministic path.  ``interpret=True`` runs
    the kernel in Pallas interpret mode (CPU testing)."""
    return _flash_forward_dispatch(q, k, v, key_bias, seed, q_block, kv_block,
                                   dropout_rate, interpret=interpret)


def _pad_seq(x, target):
    if x.shape[2] == target:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, target - x.shape[2]), (0, 0)))


def _flash_padded_inputs(q, k, v, key_bias, q_block, kv_block):
    s = q.shape[2]
    sq = _round_up(s, q_block)
    sk = _round_up(s, kv_block)
    bias = jnp.pad(key_bias.astype(jnp.float32), ((0, 0), (0, sk - s)),
                   constant_values=NEG_INF)[:, None, :]  # [B, 1, Sk]
    return _pad_seq(q, sq), _pad_seq(k, sk), _pad_seq(v, sk), bias, sq, sk


def _seed_arg(seed):
    if seed is None:
        return jnp.zeros((1,), jnp.int32)
    return seed.astype(jnp.int32).reshape(1)


def _flash_forward_dispatch(q, k, v, key_bias, seed, q_block, kv_block,
                            dropout_rate, with_lse=False, interpret=False):
    from jax.experimental.pallas import tpu as pltpu

    b, n, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    qp, kp, vp, bias, sq, sk = _flash_padded_inputs(q, k, v, key_bias,
                                                    q_block, kv_block)
    grid = (b, n, sq // q_block)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, kv_block=kv_block, scale=scale,
                          dropout_rate=dropout_rate),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, n, 1, sq), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, q_block, d), lambda i, j, r: (i, j, r, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda i, j, r: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda i, j, r: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, sk), lambda i, j, r: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, q_block, d), lambda i, j, r: (i, j, r, 0)),
            pl.BlockSpec((1, 1, 1, q_block), lambda i, j, r: (i, j, 0, r)),
        ),
        interpret=interpret,
    )(_seed_arg(seed), qp, kp, vp, bias)
    if with_lse:
        return out[:, :, :s, :], lse
    return out[:, :, :s, :]


def _flash_fwd(q, k, v, key_bias, seed, q_block, kv_block, dropout_rate,
               interpret):
    out, lse = _flash_forward_dispatch(q, k, v, key_bias, seed, q_block,
                                       kv_block, dropout_rate, with_lse=True,
                                       interpret=interpret)
    return out, (q, k, v, key_bias, seed, out, lse)


def _flash_bwd(q_block, kv_block, dropout_rate, interpret, residuals, g):
    """Blockwise Pallas backward: P recomputed from the saved logsumexp;
    never materializes [B, N, S, S].  The dropout mask is regenerated from
    (seed, tile_id), bit-identical to the forward's.  ``key_bias`` is a
    non-trainable padding mask, so its gradient is defined as zeros.
    """
    from jax.experimental.pallas import tpu as pltpu

    q, k, v, key_bias, seed, out, lse = residuals
    b, n, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    qp, kp, vp, bias, sq, sk = _flash_padded_inputs(q, k, v, key_bias,
                                                    q_block, kv_block)
    dop = _pad_seq(g, sq)
    op = _pad_seq(out, sq)
    # lse already has padded length sq.
    seed_a = _seed_arg(seed)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, kv_block=kv_block, scale=scale,
                          dropout_rate=dropout_rate),
        out_shape=jax.ShapeDtypeStruct((b, n, sq, d), q.dtype),
        grid=(b, n, sq // q_block),
        in_specs=[
            smem,
            pl.BlockSpec((1, 1, q_block, d), lambda i, j, r: (i, j, r, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda i, j, r: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda i, j, r: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, sk), lambda i, j, r: (i, 0, 0)),
            pl.BlockSpec((1, 1, q_block, d), lambda i, j, r: (i, j, r, 0)),
            pl.BlockSpec((1, 1, q_block, d), lambda i, j, r: (i, j, r, 0)),
            pl.BlockSpec((1, 1, 1, q_block), lambda i, j, r: (i, j, 0, r)),
        ],
        out_specs=pl.BlockSpec((1, 1, q_block, d), lambda i, j, r: (i, j, r, 0)),
        interpret=interpret,
    )(seed_a, qp, kp, vp, bias, dop, op, lse)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, q_block=q_block, scale=scale,
                          dropout_rate=dropout_rate),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b, n, sk, d), v.dtype),
        ),
        grid=(b, n, sk // kv_block),
        in_specs=[
            smem,
            pl.BlockSpec((1, 1, sq, d), lambda i, j, r: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, kv_block, d), lambda i, j, r: (i, j, r, 0)),
            pl.BlockSpec((1, 1, kv_block, d), lambda i, j, r: (i, j, r, 0)),
            pl.BlockSpec((1, 1, kv_block), lambda i, j, r: (i, 0, r)),
            pl.BlockSpec((1, 1, sq, d), lambda i, j, r: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, sq, d), lambda i, j, r: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, sq), lambda i, j, r: (i, j, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, kv_block, d), lambda i, j, r: (i, j, r, 0)),
            pl.BlockSpec((1, 1, kv_block, d), lambda i, j, r: (i, j, r, 0)),
        ),
        interpret=interpret,
    )(seed_a, qp, kp, vp, bias, dop, op, lse)

    dbias = jnp.zeros_like(key_bias)
    dseed = (None if seed is None
             else np.zeros(seed.shape, dtype=jax.dtypes.float0))
    return dq[:, :, :s, :], dk[:, :, :s, :], dv[:, :, :s, :], dbias, dseed


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def _head_parallel(kernel_local, q, k, v, key_bias, seed, mesh):
    """Run an attention kernel under tensor parallelism via shard_map.

    Attention is embarrassingly parallel over heads: with q/k/v column-
    sharded on the ``model`` axis (the Megatron TP layout), every shard
    attends its own ``num_heads / mp`` heads locally -- no collective at
    all.  Without this wrapper a Pallas custom-call would force GSPMD to
    all-gather the head-sharded activations around it.

    ``kernel_local(qs, ks, vs, bias_s, seed_s_or_None)`` sees per-shard
    [B/dp, S, H/mp] arrays; the dropout seed is decorrelated across head
    shards before the call.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

    heads_spec = P(DATA_AXIS, None, MODEL_AXIS)
    bias_spec = P(DATA_AXIS, None)

    mp = mesh.shape[MODEL_AXIS]

    def local(qs, ks, vs, bs, *seed_s):
        if seed_s:
            # Decorrelate across BOTH mesh axes: the kernel's in-tile PRNG
            # seeds on the shard-LOCAL batch index, so without the data-axis
            # term every dp shard would draw identical dropout masks for its
            # local rows (rows i and i+B/dp sharing masks under dp x tp).
            shard = (jax.lax.axis_index(MODEL_AXIS)
                     + mp * jax.lax.axis_index(DATA_AXIS))
            s_ = seed_s[0] + shard * 1000003
        else:
            s_ = None
        return kernel_local(qs, ks, vs, bs, s_)

    args = (q, k, v, key_bias) + (() if seed is None else (seed,))
    specs = (heads_spec, heads_spec, heads_spec, bias_spec) + \
        (() if seed is None else (P(),))
    return shard_map(
        local, mesh=mesh, in_specs=specs, out_specs=heads_spec,
        check_vma=False,
    )(*args)


def multi_head_attention(
    q: jnp.ndarray,  # [B, S, H]
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # [B, 1, 1, S] additive key mask
    *,
    num_heads: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    use_flash: str = "auto",
    on_tpu: bool = False,
    mesh=None,
    stash_probs: bool = False,
) -> jnp.ndarray:
    """Split heads, attend, merge heads.  Returns [B, S, H].

    ``on_tpu`` selects the compiled Pallas kernel (True) vs interpret mode /
    XLA fallback (False).  Resolve it on the host (``default_on_tpu()``) and
    thread it in -- it is deliberately NOT sniffed at trace time.

    ``mesh``: pass the (data, model) mesh when running under tensor
    parallelism so the short kernel runs head-parallel via shard_map
    (each shard attends its local heads; no collectives).  With mesh=None
    and model sharding active, the Pallas custom-call would otherwise make
    GSPMD gather the full hidden dim around it.
    """
    b, s, h = q.shape
    d = h // num_heads
    qh = q.reshape(b, s, num_heads, d)
    kh = k.reshape(b, s, num_heads, d)
    vh = v.reshape(b, s, num_heads, d)

    dropout_active = (not deterministic) and dropout_rate > 0.0 \
        and dropout_rng is not None
    if use_flash == "always":
        short = s <= _SHORT_MAX_SEQ
        flash = not short
    elif use_flash == "never":
        short = flash = False
    else:
        short = on_tpu and s <= _SHORT_MAX_SEQ
        flash = on_tpu and s >= _FLASH_MIN_SEQ
    if dropout_active and not on_tpu:
        # in-kernel dropout needs the TPU PRNG (no interpret-mode support)
        short = flash = False

    if short:
        # Whole-sequence kernel in the NATURAL [B, S, H] layout: no
        # head-split transposes, no [B,N,S,S] HBM buffers, in-kernel dropout.
        # v2 = block-diagonal head packing: 2x fewer MXU instructions per
        # program; measured 1.25->0.81 (joint) / 0.52->0.38 (text) ms/layer
        # fwd+bwd on v5e vs the per-head-loop v1 (BENCH.md round 2).
        # stash_probs ('+probs' remat suffix) swaps in the v2s entry whose
        # backward consumes checkpoint-saved signed probs instead of
        # recomputing softmax+dropout; identical forward math.
        from .short_attention import short_attention_v2, short_attention_v2s
        key_bias = bias[:, 0, 0, :]
        if dropout_active:
            seed = jax.random.randint(dropout_rng, (1,), 0, 2**31 - 1,
                                      dtype=jnp.int32)
            # snap to t/256: the in-kernel mask then derives 4 keep
            # decisions per u32 PRNG draw (short_attention._keep_mask)
            from .short_attention import quantize_dropout_rate
            rate = quantize_dropout_rate(float(dropout_rate))
        else:
            seed, rate = None, 0.0
        from ..parallel.mesh import MODEL_AXIS
        mp = mesh.shape.get(MODEL_AXIS, 1) if mesh is not None else 1
        if mp > 1 and num_heads % mp == 0:
            # '+probs' is not plumbed through the shard_map TP path (the
            # stash would need per-shard residual naming); v2 recompute
            # backward stays -- numerics identical either way.
            def local_short(qs, ks, vs, bs, s_):
                return short_attention_v2(qs, ks, vs, bs, s_,
                                          num_heads // mp, rate, not on_tpu)
            return _head_parallel(local_short, q, k, v, key_bias, seed, mesh)
        entry = short_attention_v2s if stash_probs else short_attention_v2
        return entry(q, k, v, key_bias, seed, num_heads, rate, not on_tpu)

    if flash:
        key_bias = bias[:, 0, 0, :]  # [B, S]
        if dropout_active:
            seed = jax.random.randint(dropout_rng, (1,), 0, 2**31 - 1,
                                      dtype=jnp.int32)
            # snap to t/256: the in-kernel mask then derives 4 keep
            # decisions per u32 PRNG draw (short_attention._keep_mask)
            from .short_attention import quantize_dropout_rate
            rate = quantize_dropout_rate(float(dropout_rate))
        else:
            seed, rate = None, 0.0
        # 512-blocks won the v5e sweep at every S>=1024 (BENCH.md round 2);
        # shorter sequences use one whole-sequence block.
        bq = min(_FLASH_BQ, _round_up(s, 128))
        bk = min(_FLASH_BK, _round_up(s, 128))

        if _USE_FLASH2:
            # Natural-layout lane-packed kernel: no head-split transposes,
            # full-128-lane dots, remat-saveable lse residual (flash2.py).
            from .flash2 import flash_attention2

            def flash_bsh(qx, kx, vx, bias_x, seed_x):
                nh = qx.shape[-1] // d
                return flash_attention2(qx, kx, vx, bias_x, seed_x, nh,
                                        rate, not on_tpu)
        else:
            def flash_bsh(qx, kx, vx, bias_x, seed_x):
                nh = qx.shape[-1] // d
                t = lambda x: x.reshape(x.shape[0], s, nh, d).transpose(0, 2, 1, 3)
                out = _flash_attention(t(qx), t(kx), t(vx), bias_x, seed_x,
                                       bq, bk, rate, not on_tpu)
                return out.transpose(0, 2, 1, 3).reshape(qx.shape)

        from ..parallel.mesh import MODEL_AXIS
        mp = mesh.shape.get(MODEL_AXIS, 1) if mesh is not None else 1
        if mp > 1 and num_heads % mp == 0:
            # head-parallel under TP, same as the short kernel
            return _head_parallel(flash_bsh, q, k, v, key_bias, seed, mesh)
        return flash_bsh(q, k, v, key_bias, seed)
    else:
        ctx = _xla_attention(qh, kh, vh, bias, dropout_rate, dropout_rng,
                             deterministic)
    return ctx.reshape(b, s, h)
