"""Whole-sequence Pallas attention for SHORT sequences (the MSA workload).

The flagship MMBert step runs attention at S=40/80.  XLA handles the
matmuls fine there, but its lowering materializes [B,N,S,S] probs + u32
dropout bits in HBM and inserts [B,S,H]<->[B,N,S,D] layout copies around
every layer — measured ~22 ms of a 310 ms B=64 train step (BENCH.md
round-2 profile).  This kernel removes all of it:

  * consumes q/k/v and produces ctx in the NATURAL [B, S, H] layout — no
    head-split transposes at all; heads are sliced inside the kernel in
    lane-aligned 2-head (128-lane) groups;
  * whole sequence per grid step (S fits VMEM trivially), plain softmax —
    no online-softmax bookkeeping, no saved logsumexp;
  * attention-probs dropout from the in-kernel TPU PRNG, seeded per
    (batch, head): nothing random ever touches HBM;
  * backward recomputes scores/probs in-VMEM (saves NOTHING but the
    inputs) and emits dq/dk/dv in one kernel, also in [B, S, H] layout.

Matmuls run in the storage dtype (bf16 on TPU) with f32 accumulation;
softmax in f32.  Replaces the delegated HF attention math for the hot
path (ref MMBertForPretraining.py:270-276).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = -1e9
# Above this, use the blockwise flash kernel / XLA instead (whole-[S,S]
# tiles stop fitting comfortably and online softmax wins).
MAX_SEQ = 512


def _keep_mask(seed_ref, tile_id, shape, rate: float):
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0], tile_id)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return bits >= threshold  # P(keep) = 1 - rate


def _heads_per_group(num_heads: int, d: int) -> int:
    """Heads per lane group: ~128 lanes per slice (d=64 -> pairs), always
    dividing num_heads so groups tile H exactly."""
    hpg = min(num_heads, max(1, 128 // d))
    while num_heads % hpg:
        hpg -= 1
    return hpg


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                num_heads: int, scale: float, dropout_rate: float,
                rows: int):
    """``rows`` batch rows per program: q/k/v/o blocks [R, S, H]; bias [R, S]."""
    blk_idx = pl.program_id(0)
    d = q_ref.shape[2] // num_heads
    hpg = _heads_per_group(num_heads, d)
    gw = hpg * d

    for rb in range(rows):
        b_idx = blk_idx * rows + rb
        bias = bias_ref[rb, 0].astype(jnp.float32)  # [S]
        for g in range(num_heads // hpg):
            qg = q_ref[rb, :, pl.ds(g * gw, gw)]  # [S, gw], hpg heads
            kg = k_ref[rb, :, pl.ds(g * gw, gw)]
            vg = v_ref[rb, :, pl.ds(g * gw, gw)]
            outs = []
            for h in range(hpg):
                q = qg[:, h * d:(h + 1) * d]
                k = kg[:, h * d:(h + 1) * d]
                v = vg[:, h * d:(h + 1) * d]
                s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale \
                    + bias[None, :]
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                if dropout_rate > 0.0:
                    keep = _keep_mask(seed_ref,
                                      b_idx * num_heads + g * hpg + h,
                                      p.shape, dropout_rate)
                    p = jnp.where(keep, p, 0.0) / (1.0 - dropout_rate)
                outs.append(jnp.dot(p.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32))
            o_ref[rb, :, pl.ds(g * gw, gw)] = (
                outs[0] if hpg == 1 else jnp.concatenate(outs, axis=-1)
            ).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, num_heads: int, scale: float,
                dropout_rate: float, rows: int):
    """Recompute probs in-VMEM, emit dq/dk/dv for ``rows`` batch rows."""
    blk_idx = pl.program_id(0)
    d = q_ref.shape[2] // num_heads
    hpg = _heads_per_group(num_heads, d)
    gw = hpg * d

    for rb in range(rows):
      b_idx = blk_idx * rows + rb
      bias = bias_ref[rb, 0].astype(jnp.float32)
      for g in range(num_heads // hpg):
        qg = q_ref[rb, :, pl.ds(g * gw, gw)]
        kg = k_ref[rb, :, pl.ds(g * gw, gw)]
        vg = v_ref[rb, :, pl.ds(g * gw, gw)]
        dog = do_ref[rb, :, pl.ds(g * gw, gw)]
        dqs, dks, dvs = [], [], []
        for h in range(hpg):
            q = qg[:, h * d:(h + 1) * d]
            k = kg[:, h * d:(h + 1) * d]
            v = vg[:, h * d:(h + 1) * d]
            do = dog[:, h * d:(h + 1) * d]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale \
                + bias[None, :]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)  # [S, S] f32
            dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
            if dropout_rate > 0.0:
                keep = _keep_mask(seed_ref, b_idx * num_heads + g * hpg + h,
                                  p.shape, dropout_rate)
                inv = 1.0 / (1.0 - dropout_rate)
                pd = jnp.where(keep, p, 0.0) * inv        # dropped+rescaled
                dpm = jnp.where(keep, dp, 0.0) * inv
            else:
                pd, dpm = p, dp
            dvs.append(jnp.dot(pd.astype(do.dtype).T, do,
                               preferred_element_type=jnp.float32))
            delta = jnp.sum(p * dpm, axis=-1, keepdims=True)
            ds = (p * (dpm - delta)).astype(q.dtype)
            dqs.append(jnp.dot(ds, k, preferred_element_type=jnp.float32)
                       * scale)
            dks.append(jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
                       * scale)
        cat = lambda xs: xs[0] if hpg == 1 else jnp.concatenate(xs, axis=-1)
        dq_ref[rb, :, pl.ds(g * gw, gw)] = cat(dqs).astype(dq_ref.dtype)
        dk_ref[rb, :, pl.ds(g * gw, gw)] = cat(dks).astype(dk_ref.dtype)
        dv_ref[rb, :, pl.ds(g * gw, gw)] = cat(dvs).astype(dv_ref.dtype)


def _seed_arg(seed):
    if seed is None:
        return jnp.zeros((1,), jnp.int32)
    return seed.astype(jnp.int32).reshape(1)


def _rows_per_block(b: int, cap: int) -> int:
    """Batch rows per grid step (must divide B).  Swept on v5e at the
    flagship shape [128,80,1024]: 1 row/step won (full train step 311.4 ms
    vs 317.0 at 2 rows, 321.4 at 8/4) -- fine-grained steps pipeline DMA
    against compute better than big unrolled bodies; 8 rows also overflow
    the backward's scoped VMEM.  The knob stays for other shapes."""
    r = min(cap, b)
    while b % r:
        r -= 1
    return r


def _specs(rows: int):
    from jax.experimental.pallas import tpu as pltpu

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    row = lambda s, h: pl.BlockSpec((rows, s, h), lambda i: (i, 0, 0))
    # bias rides as [B, 1, S]: Mosaic requires the last two block dims to
    # tile (8, 128) or equal the array dims; (1, S) on [B, 1, S] qualifies.
    brow = lambda s: pl.BlockSpec((rows, 1, s), lambda i: (i, 0, 0))
    return smem, row, brow


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def short_attention(q, k, v, key_bias, seed=None, num_heads=16,
                    dropout_rate=0.0, interpret=False):
    """q/k/v: [B, S, H] (natural layout); key_bias: [B, S] additive mask.

    ``seed``: [1] int32 driving in-kernel attention dropout (TPU only).
    Returns ctx [B, S, H].
    """
    return _short_fwd_call(q, k, v, key_bias, seed, num_heads, dropout_rate,
                           interpret)


def _short_fwd_call(q, k, v, key_bias, seed, num_heads, dropout_rate,
                    interpret):
    b, s, h = q.shape
    d = h // num_heads
    scale = 1.0 / math.sqrt(d)
    rows = _rows_per_block(b, 1)
    smem, row, brow = _specs(rows)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, scale=scale,
                          dropout_rate=dropout_rate, rows=rows),
        out_shape=jax.ShapeDtypeStruct((b, s, h), q.dtype),
        grid=(b // rows,),
        in_specs=[smem, row(s, h), row(s, h), row(s, h), brow(s)],
        out_specs=row(s, h),
        interpret=interpret,
    )(_seed_arg(seed), q, k, v,
      key_bias.astype(jnp.float32)[:, None, :])


def _short_fwd(q, k, v, key_bias, seed, num_heads, dropout_rate, interpret):
    out = _short_fwd_call(q, k, v, key_bias, seed, num_heads, dropout_rate,
                          interpret)
    return out, (q, k, v, key_bias, seed)


def _short_bwd(num_heads, dropout_rate, interpret, residuals, g):
    q, k, v, key_bias, seed = residuals
    b, s, h = q.shape
    d = h // num_heads
    scale = 1.0 / math.sqrt(d)
    rows = _rows_per_block(b, 1)
    smem, row, brow = _specs(rows)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, scale=scale,
                          dropout_rate=dropout_rate, rows=rows),
        out_shape=(jax.ShapeDtypeStruct((b, s, h), q.dtype),
                   jax.ShapeDtypeStruct((b, s, h), k.dtype),
                   jax.ShapeDtypeStruct((b, s, h), v.dtype)),
        grid=(b // rows,),
        in_specs=[smem, row(s, h), row(s, h), row(s, h), brow(s), row(s, h)],
        out_specs=(row(s, h), row(s, h), row(s, h)),
        interpret=interpret,
    )(_seed_arg(seed), q, k, v,
      key_bias.astype(jnp.float32)[:, None, :], g)
    dbias = jnp.zeros_like(key_bias)
    dseed = (None if seed is None
             else np.zeros(seed.shape, dtype=jax.dtypes.float0))
    return dq, dk, dv, dbias, dseed


short_attention.defvjp(_short_fwd, _short_bwd)
