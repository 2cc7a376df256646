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

# The softmax runs in the BASE-2 domain, exactly as in ops/flash2.py
# (round-4 VERDICT item 2 ported the fold here): scores are computed as
# qk^T * (scale * log2e) + bias * log2e and exponentiated with exp2 -- the
# VPU's native transcendental.  XLA lowers exp(x) to exp2(x * log2e), one
# extra [S, hpg*Sp] multiply per probs element per kernel; folding the
# constant into the EXISTING scale multiply and the host-side bias cast
# deletes it from the forward softmax AND every backward recompute (these
# kernels are instruction/VPU-bound at S<=80, BENCH.md).  Backward formulas
# are unchanged in natural units: with z = s*log2e, dL/ds =
# log2e * ln2 * p*(dp-delta) = p*(dp-delta) (log2e*ln2 == 1), so dq/dk
# still scale by the NATURAL `scale`.  p values are mathematically
# identical (2^((s-m)*log2e) == e^(s-m)).  The flag exists for A/B only;
# fwd and bwd read it at trace time inside ONE jit, so the dropout masks
# and the recomputed probs always agree between the pair.
_LOG2E = math.log2(math.e)
_EXP2_SOFTMAX = True


def _smult(scale: float) -> float:
    """The in-kernel score multiplier for the active softmax domain."""
    return scale * _LOG2E if _EXP2_SOFTMAX else scale


def _exp(x):
    return jnp.exp2(x) if _EXP2_SOFTMAX else jnp.exp(x)


# Dropout-rate quantum for the 8-bit threshold path below: rates snapped
# to t/256 let the kernel derive FOUR keep decisions per u32 PRNG draw.
_DROP_QUANT = 256


def quantize_dropout_rate(rate: float) -> float:
    """Snap ``rate`` to the nearest t/256 (t integer) so the in-kernel
    dropout threshold is an exact byte compare.

    The in-kernel PRNG was measured as the dominant VPU cost of the
    attention kernels (BENCH.md round 3: "~1 u32 draw per probs element");
    slicing each u32 into 4 independent bytes cuts the draw count 4x, at a
    rate granularity of 1/256 (0.1 -> 0.1016) -- immaterial for dropout.
    The rescale 1/(1-rate) everywhere uses the SAME snapped rate, so the
    expectation stays exactly unbiased.  Callers that skip this helper get
    the original full-u32 threshold (bit-compatible with rounds 1-3).
    """
    if rate <= 0.0:
        return 0.0
    t = min(max(int(round(rate * _DROP_QUANT)), 1), _DROP_QUANT - 1)
    return t / _DROP_QUANT


def _byte_threshold(rate: float):
    """The exact byte threshold for a t/256-quantized rate, else None."""
    t = int(round(rate * _DROP_QUANT))
    if 0 < t < _DROP_QUANT and rate == t / _DROP_QUANT:
        return t
    return None


def _keep_mask(seed_ref, tile_id, shape, rate: float):
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0], tile_id)
    t = _byte_threshold(rate)
    if t is not None and shape[0] % 4 == 0:
        # 8-bit threshold slices: one u32 draw yields 4 keep decisions
        # (keep iff byte >= t, P(keep) = 1 - t/256 = 1 - rate exactly for
        # quantized rates).  Output row i reads byte (i // (rows/4)) of
        # draw row (i % (rows/4)) -- fwd and bwd regenerate identically.
        # Cross-kernel determinism of the draw verified on v5e: the same
        # (seed, tile_id) produced bit-identical masks in the v2 forward,
        # the v2s forward, and a standalone dump kernel, including at
        # sublane-unaligned draw shapes like (20, 256) and under an
        # 8-row-padded draw (bits are indexed logically, not by layout).
        rows = shape[0] // 4
        bits = pltpu.bitcast(pltpu.prng_random_bits((rows, shape[1])),
                             jnp.uint32)
        b8 = jnp.concatenate(
            [(bits >> (8 * sl)) & jnp.uint32(0xFF) for sl in range(4)],
            axis=0)
        return b8 >= jnp.uint32(t)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return bits >= threshold  # P(keep) = 1 - rate


# Lanes per head group.  128 = one lane tile (2 heads at d=64); 256 was
# swept on v5e and loses (the block-diagonal zero blocks stop riding for
# free once the group spans >1 lane tile) -- see BENCH.md round 2.
_GROUP_LANES = 128


def _heads_per_group(num_heads: int, d: int) -> int:
    """Heads per lane group: ~_GROUP_LANES lanes per slice (d=64 -> pairs),
    always dividing num_heads so groups tile H exactly."""
    hpg = min(num_heads, max(1, _GROUP_LANES // d))
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
                s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * _smult(scale) \
                    + bias[None, :]
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = _exp(s)
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
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * _smult(scale) \
                + bias[None, :]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = _exp(s)
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


# ---------------------------------------------------------------------------
# v2: block-diagonal head packing
# ---------------------------------------------------------------------------
#
# v1 (above) loops heads and issues 2 (fwd) / 5 (bwd) MXU dots per head at
# [S, d] x [d, S] shapes -- with d=64 every dot pads to a full 128-lane tile,
# so half the issued MXU work is padding and the program is dominated by
# instruction count (measured ~4 us/program at [*, 80, 1024]).  v2 packs a
# whole lane group (hpg heads, hpg*d = 128 lanes for BERT's d=64) into ONE
# pair of full-lane dots using block-diagonal operands:
#
#   Kb[p*Sp + j, :] = (0..0, k_p[j], 0..0)   (head p's d-lane band)
#   scores = q_group [S, gw] . Kb^T          -> [S, hpg*Sp], head p's scores
#                                               in the lane-aligned block
#                                               [:, p*Sp:(p+1)*Sp]
#
# with Sp = round_up(S, 128) so every per-head block slice is lane-tile
# aligned (pad columns carry a -1e9 bias and softmax to ~0).  The zero
# blocks ride in MXU tiles the per-head dots were already wasting on
# padding, so FLOPs-on-silicon are unchanged while the instruction count
# halves (fwd) / drops 2x (bwd: 5 block dots replace 10 per-head dots).

def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _block_diag_rows(xg, hpg: int, d: int, s: int, sp: int):
    """[S, hpg*d] -> [hpg*Sp, hpg*d]: piece p keeps only head p's lane band,
    zero-padded to Sp rows.  Rides the MXU as the block-diagonal operand."""
    if hpg == 1:
        pieces = [xg]
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, xg.shape, 1)
        pieces = [
            jnp.where((lane >= p * d) & (lane < (p + 1) * d), xg, 0)
            for p in range(hpg)
        ]
    if sp > s:
        zpad = jnp.zeros((sp - s, xg.shape[1]), xg.dtype)
        pieces = [jnp.concatenate([pc, zpad], axis=0) for pc in pieces]
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=0)


def _block_bias(bias2d, hpg: int, s: int, sp: int):
    """[1, S] additive key bias -> [1, hpg*Sp] with -inf on the pad columns."""
    if sp > s:
        bias2d = jnp.concatenate(
            [bias2d, jnp.full((1, sp - s), NEG_INF, bias2d.dtype)], axis=1)
    return bias2d if hpg == 1 else jnp.concatenate([bias2d] * hpg, axis=1)


def _block_softmax(sblk, hpg: int, sp: int):
    """Per-head softmax over each lane-aligned [*, Sp] block."""
    outs = []
    for p in range(hpg):
        sb = sblk[:, p * sp : (p + 1) * sp]
        sb = sb - jnp.max(sb, axis=-1, keepdims=True)
        e = _exp(sb)
        outs.append(e / jnp.sum(e, axis=-1, keepdims=True))
    return outs[0] if hpg == 1 else jnp.concatenate(outs, axis=-1)


def _unblock_rows(xb, hpg: int, d: int, s: int, sp: int, dtype):
    """[hpg*Sp, gw] block result -> [S, gw]: head p's rows are the block at
    sublane offset p*Sp, and only its own d-lane band is meaningful."""
    if hpg == 1:
        return xb[:s].astype(dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (s, xb.shape[1]), 1)
    out = jnp.zeros((s, xb.shape[1]), xb.dtype)
    for p in range(hpg):
        band = (lane >= p * d) & (lane < (p + 1) * d)
        out = jnp.where(band, xb[p * sp : p * sp + s], out)
    return out.astype(dtype)


def _fwd_kernel_v2(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                   num_heads: int, scale: float, dropout_rate: float,
                   rows: int):
    blk_idx = pl.program_id(0)
    s, h = q_ref.shape[1], q_ref.shape[2]
    d = h // num_heads
    hpg = _heads_per_group(num_heads, d)
    gw = hpg * d
    sp = _round_up(s, 128)
    n_groups = num_heads // hpg

    for rb in range(rows):
        b_idx = blk_idx * rows + rb
        bias_b = _block_bias(bias_ref[rb].astype(jnp.float32), hpg, s, sp)
        for g in range(n_groups):
            qg = q_ref[rb, :, pl.ds(g * gw, gw)]
            kg = k_ref[rb, :, pl.ds(g * gw, gw)]
            vg = v_ref[rb, :, pl.ds(g * gw, gw)]
            kb = _block_diag_rows(kg, hpg, d, s, sp)
            vb = _block_diag_rows(vg, hpg, d, s, sp)
            sblk = jax.lax.dot_general(
                qg, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * _smult(scale) + bias_b
            p = _block_softmax(sblk, hpg, sp)
            if dropout_rate > 0.0:
                keep = _keep_mask(seed_ref, b_idx * n_groups + g, p.shape,
                                  dropout_rate)
                p = jnp.where(keep, p, 0.0) / (1.0 - dropout_rate)
            ctx = jnp.dot(p.astype(vg.dtype), vb,
                          preferred_element_type=jnp.float32)
            o_ref[rb, :, pl.ds(g * gw, gw)] = ctx.astype(o_ref.dtype)


def _bwd_kernel_v2(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                   dq_ref, dk_ref, dv_ref, *, num_heads: int, scale: float,
                   dropout_rate: float, rows: int):
    blk_idx = pl.program_id(0)
    s, h = q_ref.shape[1], q_ref.shape[2]
    d = h // num_heads
    hpg = _heads_per_group(num_heads, d)
    gw = hpg * d
    sp = _round_up(s, 128)
    n_groups = num_heads // hpg

    for rb in range(rows):
      b_idx = blk_idx * rows + rb
      bias_b = _block_bias(bias_ref[rb].astype(jnp.float32), hpg, s, sp)
      for g in range(n_groups):
        qg = q_ref[rb, :, pl.ds(g * gw, gw)]
        kg = k_ref[rb, :, pl.ds(g * gw, gw)]
        vg = v_ref[rb, :, pl.ds(g * gw, gw)]
        dog = do_ref[rb, :, pl.ds(g * gw, gw)]
        kb = _block_diag_rows(kg, hpg, d, s, sp)
        vb = _block_diag_rows(vg, hpg, d, s, sp)
        sblk = jax.lax.dot_general(
            qg, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * _smult(scale) + bias_b
        p = _block_softmax(sblk, hpg, sp)
        dp = jax.lax.dot_general(dog, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref, b_idx * n_groups + g, p.shape,
                              dropout_rate)
            inv = 1.0 / (1.0 - dropout_rate)
            pd = jnp.where(keep, p, 0.0) * inv
            dpm = jnp.where(keep, dp, 0.0) * inv
        else:
            pd, dpm = p, dp
        # per-head delta, then ds, assembled blockwise (lane-aligned slices)
        ds_parts = []
        for pi in range(hpg):
            sl = slice(pi * sp, (pi + 1) * sp)
            delta = jnp.sum(p[:, sl] * dpm[:, sl], axis=-1, keepdims=True)
            ds_parts.append(p[:, sl] * (dpm[:, sl] - delta))
        ds = (ds_parts[0] if hpg == 1
              else jnp.concatenate(ds_parts, axis=-1)).astype(qg.dtype)
        dq = jnp.dot(ds, kb, preferred_element_type=jnp.float32) * scale
        dkb = jax.lax.dot_general(ds, qg, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dvb = jax.lax.dot_general(pd.astype(dog.dtype), dog,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dq_ref[rb, :, pl.ds(g * gw, gw)] = dq.astype(dq_ref.dtype)
        dk_ref[rb, :, pl.ds(g * gw, gw)] = _unblock_rows(
            dkb * scale, hpg, d, s, sp, dk_ref.dtype)
        dv_ref[rb, :, pl.ds(g * gw, gw)] = _unblock_rows(
            dvb, hpg, d, s, sp, dv_ref.dtype)


def _bwd_kernel_v3(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, do_ref,
                   dq_ref, dk_ref, dv_ref, *, num_heads: int, scale: float,
                   dropout_rate: float, rows: int):
    """v2 backward with the flash ``delta`` trick: the softmax-vjp row sum
    sum_j(p_dropped_ij * dp_ij) equals do_i . o_i (o = p_dropped . v), so
    the [S, hpg*Sp]-wide f32 multiply+reduce per group collapses to a
    d-lane-band multiply+reduce of tensors already in VMEM -- and o is
    exactly the ctx the save_attn remat policy already stashes, so the
    extra residual is free."""
    blk_idx = pl.program_id(0)
    s, h = q_ref.shape[1], q_ref.shape[2]
    d = h // num_heads
    hpg = _heads_per_group(num_heads, d)
    gw = hpg * d
    sp = _round_up(s, 128)
    n_groups = num_heads // hpg

    for rb in range(rows):
      b_idx = blk_idx * rows + rb
      bias_b = _block_bias(bias_ref[rb].astype(jnp.float32), hpg, s, sp)
      for g in range(n_groups):
        qg = q_ref[rb, :, pl.ds(g * gw, gw)]
        kg = k_ref[rb, :, pl.ds(g * gw, gw)]
        vg = v_ref[rb, :, pl.ds(g * gw, gw)]
        og = o_ref[rb, :, pl.ds(g * gw, gw)]
        dog = do_ref[rb, :, pl.ds(g * gw, gw)]
        kb = _block_diag_rows(kg, hpg, d, s, sp)
        vb = _block_diag_rows(vg, hpg, d, s, sp)
        sblk = jax.lax.dot_general(
            qg, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * _smult(scale) + bias_b
        p = _block_softmax(sblk, hpg, sp)
        dp = jax.lax.dot_general(dog, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref, b_idx * n_groups + g, p.shape,
                              dropout_rate)
            inv = 1.0 / (1.0 - dropout_rate)
            pd = jnp.where(keep, p, 0.0) * inv
            dpm = jnp.where(keep, dp, 0.0) * inv
        else:
            pd, dpm = p, dp
        # delta_i = do_i . o_i per head band (replaces sum_j p_ij dpm_ij)
        doo = dog.astype(jnp.float32) * og.astype(jnp.float32)  # [S, gw]
        ds_parts = []
        for pi in range(hpg):
            delta = jnp.sum(doo[:, pi * d:(pi + 1) * d], axis=-1,
                            keepdims=True)
            sl = slice(pi * sp, (pi + 1) * sp)
            ds_parts.append(p[:, sl] * (dpm[:, sl] - delta))
        ds = (ds_parts[0] if hpg == 1
              else jnp.concatenate(ds_parts, axis=-1)).astype(qg.dtype)
        dq = jnp.dot(ds, kb, preferred_element_type=jnp.float32) * scale
        dkb = jax.lax.dot_general(ds, qg, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dvb = jax.lax.dot_general(pd.astype(dog.dtype), dog,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dq_ref[rb, :, pl.ds(g * gw, gw)] = dq.astype(dq_ref.dtype)
        dk_ref[rb, :, pl.ds(g * gw, gw)] = _unblock_rows(
            dkb * scale, hpg, d, s, sp, dk_ref.dtype)
        dv_ref[rb, :, pl.ds(g * gw, gw)] = _unblock_rows(
            dvb, hpg, d, s, sp, dv_ref.dtype)


# ---------------------------------------------------------------------------
# Packed-QKV variant: ONE [B, S, 3H] operand instead of three [B, S, H]
# ---------------------------------------------------------------------------
#
# Motivation (BENCH.md round-2 profile): under save_attn the scan stash
# moves 5 separate [tokens, H] buffers per layer through per-iteration
# dynamic_update_slice / dynamic_slice+squeeze copies that run latency-
# bound (~21.8 ms of the B=96 step).  Packing q|k|v into one [tokens, 3H]
# named value ('attn_pack') turns 3 of those per-iteration transfers into
# 1 bigger one, XLA fuses the three projection epilogues into disjoint
# regions of the concat buffer, and this kernel consumes/produces the
# packed layout directly (slicing inside VMEM is free) so no unpack copies
# ever hit HBM.  The backward emits one packed [B, S, 3H] dqkv.

def _fwd_kernel_v2p(seed_ref, qkv_ref, bias_ref, o_ref, *,
                    num_heads: int, scale: float, dropout_rate: float,
                    rows: int):
    blk_idx = pl.program_id(0)
    s = qkv_ref.shape[1]
    h = qkv_ref.shape[2] // 3
    d = h // num_heads
    hpg = _heads_per_group(num_heads, d)
    gw = hpg * d
    sp = _round_up(s, 128)
    n_groups = num_heads // hpg

    for rb in range(rows):
        b_idx = blk_idx * rows + rb
        bias_b = _block_bias(bias_ref[rb].astype(jnp.float32), hpg, s, sp)
        for g in range(n_groups):
            qg = qkv_ref[rb, :, pl.ds(g * gw, gw)]
            kg = qkv_ref[rb, :, pl.ds(h + g * gw, gw)]
            vg = qkv_ref[rb, :, pl.ds(2 * h + g * gw, gw)]
            kb = _block_diag_rows(kg, hpg, d, s, sp)
            vb = _block_diag_rows(vg, hpg, d, s, sp)
            sblk = jax.lax.dot_general(
                qg, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * _smult(scale) + bias_b
            p = _block_softmax(sblk, hpg, sp)
            if dropout_rate > 0.0:
                keep = _keep_mask(seed_ref, b_idx * n_groups + g, p.shape,
                                  dropout_rate)
                p = jnp.where(keep, p, 0.0) / (1.0 - dropout_rate)
            ctx = jnp.dot(p.astype(vg.dtype), vb,
                          preferred_element_type=jnp.float32)
            o_ref[rb, :, pl.ds(g * gw, gw)] = ctx.astype(o_ref.dtype)


def _bwd_kernel_v2p(seed_ref, qkv_ref, bias_ref, o_ref, do_ref, dqkv_ref, *,
                    num_heads: int, scale: float, dropout_rate: float,
                    rows: int):
    """v3 backward (delta from do.o) on the packed layout; dq/dk/dv land in
    the thirds of one [R, S, 3H] output block."""
    blk_idx = pl.program_id(0)
    s = qkv_ref.shape[1]
    h = qkv_ref.shape[2] // 3
    d = h // num_heads
    hpg = _heads_per_group(num_heads, d)
    gw = hpg * d
    sp = _round_up(s, 128)
    n_groups = num_heads // hpg

    for rb in range(rows):
      b_idx = blk_idx * rows + rb
      bias_b = _block_bias(bias_ref[rb].astype(jnp.float32), hpg, s, sp)
      for g in range(n_groups):
        qg = qkv_ref[rb, :, pl.ds(g * gw, gw)]
        kg = qkv_ref[rb, :, pl.ds(h + g * gw, gw)]
        vg = qkv_ref[rb, :, pl.ds(2 * h + g * gw, gw)]
        og = o_ref[rb, :, pl.ds(g * gw, gw)]
        dog = do_ref[rb, :, pl.ds(g * gw, gw)]
        kb = _block_diag_rows(kg, hpg, d, s, sp)
        vb = _block_diag_rows(vg, hpg, d, s, sp)
        sblk = jax.lax.dot_general(
            qg, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * _smult(scale) + bias_b
        p = _block_softmax(sblk, hpg, sp)
        dp = jax.lax.dot_general(dog, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref, b_idx * n_groups + g, p.shape,
                              dropout_rate)
            inv = 1.0 / (1.0 - dropout_rate)
            pd = jnp.where(keep, p, 0.0) * inv
            dpm = jnp.where(keep, dp, 0.0) * inv
        else:
            pd, dpm = p, dp
        doo = dog.astype(jnp.float32) * og.astype(jnp.float32)
        ds_parts = []
        for pi in range(hpg):
            delta = jnp.sum(doo[:, pi * d:(pi + 1) * d], axis=-1,
                            keepdims=True)
            sl = slice(pi * sp, (pi + 1) * sp)
            ds_parts.append(p[:, sl] * (dpm[:, sl] - delta))
        ds = (ds_parts[0] if hpg == 1
              else jnp.concatenate(ds_parts, axis=-1)).astype(qg.dtype)
        dq = jnp.dot(ds, kb, preferred_element_type=jnp.float32) * scale
        dkb = jax.lax.dot_general(ds, qg, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dvb = jax.lax.dot_general(pd.astype(dog.dtype), dog,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dqkv_ref[rb, :, pl.ds(g * gw, gw)] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[rb, :, pl.ds(h + g * gw, gw)] = _unblock_rows(
            dkb * scale, hpg, d, s, sp, dqkv_ref.dtype)
        dqkv_ref[rb, :, pl.ds(2 * h + g * gw, gw)] = _unblock_rows(
            dvb, hpg, d, s, sp, dqkv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def short_attention_v2p(qkv, key_bias, seed=None, num_heads=16,
                        dropout_rate=0.0, interpret=False):
    """Packed entry: qkv [B, S, 3H] (q|k|v thirds), key_bias [B, S].

    Same math as :func:`short_attention_v2` (PRNG seeded per (batch,
    head-group) tile, identical masks); backward uses the v3 delta trick
    and returns a packed [B, S, 3H] dqkv.
    """
    return _v2p_fwd_call(qkv, key_bias, seed, num_heads, dropout_rate,
                         interpret)


def _v2p_fwd_call(qkv, key_bias, seed, num_heads, dropout_rate, interpret):
    b, s, h3 = qkv.shape
    h = h3 // 3
    scale = 1.0 / math.sqrt(h // num_heads)
    rows = _rows_per_block(b, _V2_ROWS)
    smem, row, brow = _specs(rows)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_v2p, num_heads=num_heads, scale=scale,
                          dropout_rate=dropout_rate, rows=rows),
        out_shape=jax.ShapeDtypeStruct((b, s, h), qkv.dtype),
        grid=(b // rows,),
        in_specs=[smem, row(s, h3), brow(s)],
        out_specs=row(s, h),
        interpret=interpret,
    )(_seed_arg(seed), qkv, _bias_arg(key_bias))


def _v2p_fwd(qkv, key_bias, seed, num_heads, dropout_rate, interpret):
    out = _v2p_fwd_call(qkv, key_bias, seed, num_heads, dropout_rate,
                        interpret)
    return out, (qkv, key_bias, seed, out)


def _v2p_bwd(num_heads, dropout_rate, interpret, residuals, g):
    qkv, key_bias, seed, out = residuals
    b, s, h3 = qkv.shape
    h = h3 // 3
    scale = 1.0 / math.sqrt(h // num_heads)
    rows = _rows_per_block(b, _V2_BWD_ROWS)
    smem, row, brow = _specs(rows)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel_v2p, num_heads=num_heads, scale=scale,
                          dropout_rate=dropout_rate, rows=rows),
        out_shape=jax.ShapeDtypeStruct((b, s, h3), qkv.dtype),
        grid=(b // rows,),
        in_specs=[smem, row(s, h3), brow(s), row(s, h), row(s, h)],
        out_specs=row(s, h3),
        interpret=interpret,
    )(_seed_arg(seed), qkv, _bias_arg(key_bias), out, g)
    dbias = jnp.zeros_like(key_bias)
    dseed = (None if seed is None
             else np.zeros(seed.shape, dtype=jax.dtypes.float0))
    return dqkv, dbias, dseed


short_attention_v2p.defvjp(_v2p_fwd, _v2p_bwd)


def _seed_arg(seed):
    if seed is None:
        return jnp.zeros((1,), jnp.int32)
    return seed.astype(jnp.int32).reshape(1)


def _bias_arg(key_bias):
    """[B, S] additive bias -> the [B, 1, S] kernel operand, pre-multiplied
    into the active softmax domain (host-side, like flash2: zero in-kernel
    cost; the -10000/NEG_INF fills stay equally -inf-like scaled)."""
    b = key_bias.astype(jnp.float32)
    if _EXP2_SOFTMAX:
        b = b * _LOG2E
    return b[:, None, :]


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
      _bias_arg(key_bias))


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
      _bias_arg(key_bias), g)
    dbias = jnp.zeros_like(key_bias)
    dseed = (None if seed is None
             else np.zeros(seed.shape, dtype=jax.dtypes.float0))
    return dq, dk, dv, dbias, dseed


short_attention.defvjp(_short_fwd, _short_bwd)


# ---------------------------------------------------------------------------
# v2 public entry (same contract as short_attention; block-diagonal kernels)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def short_attention_v2(q, k, v, key_bias, seed=None, num_heads=16,
                       dropout_rate=0.0, interpret=False):
    """Block-diagonal-packed variant of :func:`short_attention`.

    Identical math and contract; ~2x fewer MXU instructions per program
    (see the v2 section comment above).  NOTE: the in-kernel dropout PRNG is
    seeded per (batch, head-GROUP) tile rather than per (batch, head), so
    with dropout active v1 and v2 draw different (equally valid) masks.
    """
    return _v2_fwd_call(q, k, v, key_bias, seed, num_heads, dropout_rate,
                        interpret)


# v2 rows-per-block: 4 won the v5e sweep for fwd+bwd at both flagship
# shapes (joint [128,80,1024]: 0.751 ms/layer vs 0.817 at rows=1; text
# [64,40,1024]: 0.384 vs 0.420); 8 is worse, 16 overflows scoped VMEM in
# the backward.  (v1 keeps rows=1 -- its bigger per-head bodies pipeline
# worse, see _rows_per_block.)
_V2_ROWS = 4
# Backward rows-per-block, swept separately (the bwd body is ~2.5x the
# fwd's and carries one more [R,S,H] input): module-level so bench_short
# can sweep it without re-importing.
_V2_BWD_ROWS = 4
# The v3 backward (delta from do.o, see _bwd_kernel_v3) was measured at the
# FULL-STEP level on v5e (B=96, save_attn remat, bench_step_ablation) and
# LOSES: 373.6 ms/step vs 363.4 with the v2 backward, even though the
# microbench shows it faster on the text shape (0.487 vs 0.573 ms/layer) --
# under save_attn the extra ``o`` residual is one more per-iteration stash
# read (the step's biggest non-roofline item) and one more [R,S,H] DMA per
# program, which outweighs the collapsed delta reduction.  save_pack (the
# packed-QKV stash, v3-style bwd) measured worse still: 383.6 ms.  v2 stays
# the default; the flag and kernels remain for re-evaluation at other
# shapes (the microbench deltas flip sign between text and joint).
_USE_V3_BWD = False


def _v2_fwd_call(q, k, v, key_bias, seed, num_heads, dropout_rate, interpret):
    b, s, h = q.shape
    d = h // num_heads
    scale = 1.0 / math.sqrt(d)
    rows = _rows_per_block(b, _V2_ROWS)
    smem, row, brow = _specs(rows)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_v2, num_heads=num_heads, scale=scale,
                          dropout_rate=dropout_rate, rows=rows),
        out_shape=jax.ShapeDtypeStruct((b, s, h), q.dtype),
        grid=(b // rows,),
        in_specs=[smem, row(s, h), row(s, h), row(s, h), brow(s)],
        out_specs=row(s, h),
        interpret=interpret,
    )(_seed_arg(seed), q, k, v,
      _bias_arg(key_bias))


def _v2_fwd(q, k, v, key_bias, seed, num_heads, dropout_rate, interpret):
    out = _v2_fwd_call(q, k, v, key_bias, seed, num_heads, dropout_rate,
                       interpret)
    # out rides as a residual for the v3 backward's delta = do.o; under the
    # save_attn remat policy it is the ctx that gets stashed anyway.
    return out, (q, k, v, key_bias, seed, out)


def _v2_bwd(num_heads, dropout_rate, interpret, residuals, g):
    q, k, v, key_bias, seed, out = residuals
    b, s, h = q.shape
    d = h // num_heads
    scale = 1.0 / math.sqrt(d)
    rows = _rows_per_block(b, _V2_BWD_ROWS)
    smem, row, brow = _specs(rows)
    if _USE_V3_BWD:
        kern = functools.partial(_bwd_kernel_v3, num_heads=num_heads,
                                 scale=scale, dropout_rate=dropout_rate,
                                 rows=rows)
        ins = [smem, row(s, h), row(s, h), row(s, h), brow(s), row(s, h),
               row(s, h)]
        args = (_seed_arg(seed), q, k, v,
                _bias_arg(key_bias), out, g)
    else:
        kern = functools.partial(_bwd_kernel_v2, num_heads=num_heads,
                                 scale=scale, dropout_rate=dropout_rate,
                                 rows=rows)
        ins = [smem, row(s, h), row(s, h), row(s, h), brow(s), row(s, h)]
        args = (_seed_arg(seed), q, k, v,
                _bias_arg(key_bias), g)
    dq, dk, dv = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((b, s, h), q.dtype),
                   jax.ShapeDtypeStruct((b, s, h), k.dtype),
                   jax.ShapeDtypeStruct((b, s, h), v.dtype)),
        grid=(b // rows,),
        in_specs=ins,
        out_specs=(row(s, h), row(s, h), row(s, h)),
        interpret=interpret,
    )(*args)
    dbias = jnp.zeros_like(key_bias)
    dseed = (None if seed is None
             else np.zeros(seed.shape, dtype=jax.dtypes.float0))
    return dq, dk, dv, dbias, dseed


short_attention_v2.defvjp(_v2_fwd, _v2_bwd)


# ---------------------------------------------------------------------------
# v2s: the '+probs' remat rung -- stash SIGNED post-softmax probs
# ---------------------------------------------------------------------------
#
# The v2 backward's floor is the in-VMEM softmax+dropout recompute (qk^T
# dot, per-head max/exp/sum/div, PRNG + threshold compare -- BENCH.md
# round 3 measured the bwd kernel VPU-bound at ~2x its pure-dot time).
# This variant's forward ALSO emits the post-softmax probs with the
# dropout decision folded into the SIGN (ps = keep ? p : -p, one tensor,
# no separate mask): the backward then reads |ps| and sign(ps) and skips
# the entire score/softmax/PRNG recompute.  The probs ride the remat
# stash as a 'attn_probs'-named custom-vjp residual (tagged INSIDE the
# vjp fwd -- the flash2 lesson, BENCH.md round 3) in the storage dtype:
# [B, S, G*hpg*Sp] = num_heads * round_up(S,128) * 2 bytes per token at
# bf16.  Positions where p rounds to +/-0 contribute 0 to every gradient
# term, so the sign ambiguity of 0 is harmless; exact in the f32
# interpret-mode tests.  Selected by the '+probs' remat-policy suffix
# (models/bert.py).

def _fwd_kernel_v2s(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, p_ref, *,
                    num_heads: int, scale: float, dropout_rate: float,
                    rows: int):
    blk_idx = pl.program_id(0)
    s, h = q_ref.shape[1], q_ref.shape[2]
    d = h // num_heads
    hpg = _heads_per_group(num_heads, d)
    gw = hpg * d
    sp = _round_up(s, 128)
    n_groups = num_heads // hpg

    for rb in range(rows):
        b_idx = blk_idx * rows + rb
        bias_b = _block_bias(bias_ref[rb].astype(jnp.float32), hpg, s, sp)
        for g in range(n_groups):
            qg = q_ref[rb, :, pl.ds(g * gw, gw)]
            kg = k_ref[rb, :, pl.ds(g * gw, gw)]
            vg = v_ref[rb, :, pl.ds(g * gw, gw)]
            kb = _block_diag_rows(kg, hpg, d, s, sp)
            vb = _block_diag_rows(vg, hpg, d, s, sp)
            sblk = jax.lax.dot_general(
                qg, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * _smult(scale) + bias_b
            p = _block_softmax(sblk, hpg, sp)
            if dropout_rate > 0.0:
                keep = _keep_mask(seed_ref, b_idx * n_groups + g, p.shape,
                                  dropout_rate)
                ps = jnp.where(keep, p, -p)
                pd = jnp.where(keep, p, 0.0) / (1.0 - dropout_rate)
            else:
                ps = pd = p
            ctx = jnp.dot(pd.astype(vg.dtype), vb,
                          preferred_element_type=jnp.float32)
            o_ref[rb, :, pl.ds(g * gw, gw)] = ctx.astype(o_ref.dtype)
            p_ref[rb, :, pl.ds(g * hpg * sp, hpg * sp)] = ps.astype(p_ref.dtype)


def _bwd_kernel_v2s(q_ref, k_ref, v_ref, p_ref, do_ref,
                    dq_ref, dk_ref, dv_ref, *, num_heads: int, scale: float,
                    dropout_rate: float, rows: int):
    """Backward from STASHED probs: no scores, no softmax, no PRNG."""
    s, h = q_ref.shape[1], q_ref.shape[2]
    d = h // num_heads
    hpg = _heads_per_group(num_heads, d)
    gw = hpg * d
    sp = _round_up(s, 128)
    n_groups = num_heads // hpg

    for rb in range(rows):
      for g in range(n_groups):
        qg = q_ref[rb, :, pl.ds(g * gw, gw)]
        kg = k_ref[rb, :, pl.ds(g * gw, gw)]
        vg = v_ref[rb, :, pl.ds(g * gw, gw)]
        dog = do_ref[rb, :, pl.ds(g * gw, gw)]
        ps = p_ref[rb, :, pl.ds(g * hpg * sp, hpg * sp)].astype(jnp.float32)
        kb = _block_diag_rows(kg, hpg, d, s, sp)
        vb = _block_diag_rows(vg, hpg, d, s, sp)
        p = jnp.abs(ps)
        dp = jax.lax.dot_general(dog, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = ps > 0.0
            inv = 1.0 / (1.0 - dropout_rate)
            pd = jnp.where(keep, p, 0.0) * inv
            dpm = jnp.where(keep, dp, 0.0) * inv
        else:
            pd, dpm = p, dp
        ds_parts = []
        for pi in range(hpg):
            sl = slice(pi * sp, (pi + 1) * sp)
            delta = jnp.sum(p[:, sl] * dpm[:, sl], axis=-1, keepdims=True)
            ds_parts.append(p[:, sl] * (dpm[:, sl] - delta))
        ds = (ds_parts[0] if hpg == 1
              else jnp.concatenate(ds_parts, axis=-1)).astype(qg.dtype)
        dq = jnp.dot(ds, kb, preferred_element_type=jnp.float32) * scale
        dkb = jax.lax.dot_general(ds, qg, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dvb = jax.lax.dot_general(pd.astype(dog.dtype), dog,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dq_ref[rb, :, pl.ds(g * gw, gw)] = dq.astype(dq_ref.dtype)
        dk_ref[rb, :, pl.ds(g * gw, gw)] = _unblock_rows(
            dkb * scale, hpg, d, s, sp, dk_ref.dtype)
        dv_ref[rb, :, pl.ds(g * gw, gw)] = _unblock_rows(
            dvb, hpg, d, s, sp, dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def short_attention_v2s(q, k, v, key_bias, seed=None, num_heads=16,
                        dropout_rate=0.0, interpret=False):
    """:func:`short_attention_v2` with a probs-stashing backward.

    Identical forward math (same PRNG tiles -> same dropout masks as v2);
    when differentiated, the forward additionally emits signed post-softmax
    probs as a 'attn_probs' checkpoint-named residual and the backward
    consumes them instead of recomputing softmax+dropout.  The primal
    (non-differentiated) call runs the plain v2 kernel -- eval never pays
    the probs HBM write.
    """
    return _v2_fwd_call(q, k, v, key_bias, seed, num_heads, dropout_rate,
                        interpret)


def _v2s_fwd_call(q, k, v, key_bias, seed, num_heads, dropout_rate,
                  interpret):
    b, s, h = q.shape
    d = h // num_heads
    hpg = _heads_per_group(num_heads, d)
    sp = _round_up(s, 128)
    n_groups = num_heads // hpg
    scale = 1.0 / math.sqrt(d)
    rows = _rows_per_block(b, _V2_ROWS)
    smem, row, brow = _specs(rows)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_v2s, num_heads=num_heads, scale=scale,
                          dropout_rate=dropout_rate, rows=rows),
        out_shape=(jax.ShapeDtypeStruct((b, s, h), q.dtype),
                   jax.ShapeDtypeStruct((b, s, n_groups * hpg * sp), q.dtype)),
        grid=(b // rows,),
        in_specs=[smem, row(s, h), row(s, h), row(s, h), brow(s)],
        out_specs=(row(s, h), row(s, n_groups * hpg * sp)),
        interpret=interpret,
    )(_seed_arg(seed), q, k, v,
      _bias_arg(key_bias))


def _v2s_fwd(q, k, v, key_bias, seed, num_heads, dropout_rate, interpret):
    from jax.ad_checkpoint import checkpoint_name

    out, probs = _v2s_fwd_call(q, k, v, key_bias, seed, num_heads,
                               dropout_rate, interpret)
    # Tag BOTH residuals INSIDE the vjp fwd (the flash2 lesson): the policy
    # then saves the residual vars themselves and the backward never re-runs
    # this kernel (launch count pinned in tests/test_short_attention.py).
    out = checkpoint_name(out, "attn_ctx")
    probs = checkpoint_name(probs, "attn_probs")
    return out, (q, k, v, key_bias, seed, probs)


def _v2s_bwd(num_heads, dropout_rate, interpret, residuals, g):
    q, k, v, key_bias, seed, probs = residuals
    b, s, h = q.shape
    d = h // num_heads
    scale = 1.0 / math.sqrt(d)
    rows = _rows_per_block(b, _V2_BWD_ROWS)
    smem, row, brow = _specs(rows)
    pw = probs.shape[2]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_v2s, num_heads=num_heads, scale=scale,
                          dropout_rate=dropout_rate, rows=rows),
        out_shape=(jax.ShapeDtypeStruct((b, s, h), q.dtype),
                   jax.ShapeDtypeStruct((b, s, h), k.dtype),
                   jax.ShapeDtypeStruct((b, s, h), v.dtype)),
        grid=(b // rows,),
        in_specs=[row(s, h), row(s, h), row(s, h), row(s, pw), row(s, h)],
        out_specs=(row(s, h), row(s, h), row(s, h)),
        interpret=interpret,
    )(q, k, v, probs, g)
    dbias = jnp.zeros_like(key_bias)
    dseed = (None if seed is None
             else np.zeros(seed.shape, dtype=jax.dtypes.float0))
    return dq, dk, dv, dbias, dseed


short_attention_v2s.defvjp(_v2s_fwd, _v2s_bwd)
