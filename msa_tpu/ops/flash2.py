"""Blockwise flash attention v2: NATURAL [B, S, H] layout + lane packing.

The original flash kernel (ops/attention.py) works in the [B, N, S, D]
head-split layout: XLA inserts ~8 relayout transposes per encoder layer
around it, and with BERT's d=64 every MXU dot uses only half the 128
contracting/output lanes.  Profiled at the frame-level S=1024 step
(benchmarks/bench_frame_level.py, round 3) the kernels + transposes were
~40% of the 1038 ms step, running at ~19% of bf16 peak.

This kernel applies the short_attention v2 recipe to blockwise flash:

  * q/k/v/ctx stay in the natural [B, S, H] layout end to end -- heads are
    lane-sliced in-kernel in ``hpg``-head 128-lane groups, so NO transposes
    exist anywhere in the graph;
  * each (batch, head-group, q-block) program runs online softmax over kv
    blocks with BLOCK-DIAGONAL packed operands (short_attention.py's
    ``_block_diag_rows``): the qk^T and pv dots engage all 128 lanes;
  * softmax stats (m, l) are tracked per head band; the saved row-lse comes
    out as one [B, G, hpg, Sq] f32 tensor;
  * in-kernel attention dropout from the TPU PRNG, regenerated bit-identical
    in both backward kernels from (seed, tile_id);
  * the custom-vjp residuals are exactly (q, k, v, ctx, lse):
    ``checkpoint_name`` tags lse as 'attn_lse' so the remat policies in
    models/bert.py can SAVE it -- combined with the call-site's 'attn_ctx'
    tag the backward then never re-runs the forward kernel (under the old
    kernel that re-run was unavoidable and cost ~90 ms/step at S=1024).

Replaces the delegated HF attention math for long sequences (ref
MMBertForPretraining.py:270-276); dispatched from
ops/attention.py::multi_head_attention when S >= _FLASH_MIN_SEQ.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .short_attention import (
    _block_bias,
    _block_diag_rows,
    _heads_per_group,
    _keep_mask,
    _round_up,
    _seed_arg,
    _unblock_rows,
)

NEG_INF = -1e9

# The softmax runs in the BASE-2 domain: scores are computed as
# qk^T * (scale * log2(e)) + bias * log2(e) and exponentiated with exp2.
# The VPU's native transcendental is exp2 -- XLA lowers exp(x) to
# exp2(x * log2e), one extra [bq, hpg*bk] multiply per probs element per
# kernel; folding the constant into the EXISTING f32 scale/bias multiplies
# deletes it from the fwd softmax AND every backward recompute.  The
# backward formulas are unchanged in natural units: with z = s*log2e,
# dL/ds = log2e * ln2 * p*(dp-delta) = p*(dp-delta) (log2e*ln2 == 1), so
# dq/dk still scale by the NATURAL `scale`.  p values are mathematically
# identical (2^((s-m)*log2e) == e^(s-m)); lse is stored in log2 units,
# produced and consumed only by this kernel pair.
_LOG2E = math.log2(math.e)

# Block sizes (module-level so bench harnesses can sweep them).  Defaults
# from the v5e S=1024 joint-shape sweep (benchmarks/bench_flash2.py,
# BENCH.md round 3): bq=256/bk=1024 beats 512/512 by ~1.5 ms/call fwd+bwd
# (fewer online-softmax passes); 512/1024 overflows the 16 MB scoped VMEM
# in the backward.
_BQ = 256
_BK = 1024
_BWD_BQ = 256
_BWD_BK = 1024
# One fused backward program per (batch, group) computing dq+dk+dv in a
# single sweep: the softmax recompute (exp) and the dropout mask regen run
# ONCE per tile instead of once in _dq_kernel and again in _dkv_kernel,
# and the qk^T / do.v^T dots drop from 7 to 5 per tile.  False = the
# split two-kernel backward (kept for A/B).
_FUSED_BWD = True


def _pick_block(s: int, pref: int) -> int:
    """Largest block <= pref that adds no padding beyond the 128-lane
    round-up.  bk=1024 wins at S=1024 (one kv block, single softmax pass)
    but would pad S=1536 to 2048 (+33% kv FLOPs); this picks 512 there.
    Forward and backward derive blocks identically from S, so the dropout
    tile decomposition stays bit-identical."""
    s128 = _round_up(s, 128)
    b = min(pref, s128)
    while b > 128 and s128 % b:
        b //= 2
    return b if s128 % b == 0 else 128


def _blocks_for(s: int, bq_pref: int, bk_pref: int):
    """(bq, bk) for sequence length s.  bk is capped at 512 from S=2048 on:
    at S=4096 bk=1024 measured 18.45 MB against the 16 MB scoped-VMEM limit
    (the split-backward dkv program holds three full-[Sq, gw] bands PLUS
    [bq, hpg*bk] f32 tiles), and at S=2048 the round-5 sweep measured
    bq=256/bk=512 BEATING 256/1024 (1022.8 vs 1028.6 ms/step at the B=8
    frame-level shape; 512/512 and 128/512 lose ~8%, 128/1024 and 256/2048
    overflow scoped VMEM — BENCH.md round 5).  bk=1024 still wins at
    S=1024, where it means a single kv block.  Forward and backward call
    this with the same s, so the dropout tile decomposition always
    matches."""
    if s >= 2048:
        bk_pref = min(bk_pref, 512)
    return _pick_block(s, bq_pref), _pick_block(s, bk_pref)


def _tile_id(i, g, r, kb, n_groups, n_qb, n_kb):
    """Dropout tile id, shared by fwd / dq / dkv so masks regenerate
    bit-identical: one tile = one (batch, head-group, q-block, kv-block)
    [bq, hpg*bk] probs block."""
    return ((i * n_groups + g) * n_qb + r) * n_kb + kb


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                hpg: int, d: int, bk: int, scale: float,
                dropout_rate: float):
    """One (batch, group, q-block) program.

    Blocks: q_ref/o_ref [1, bq, gw]; k_ref/v_ref [1, Sk, gw] (this group's
    lane band); bias_ref [1, 1, Sk]; lse_ref [1, 1, hpg, bq].
    """
    qg = q_ref[0]                      # [bq, gw]
    bq, gw = qg.shape
    sk = k_ref.shape[1]
    num_kb = sk // bk
    i, g, r = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_groups, n_qb = pl.num_programs(1), pl.num_programs(2)
    scale2 = scale * _LOG2E            # base-2 softmax domain (see _LOG2E)

    def body(kb_idx, carry):
        acc, m, l = carry              # [bq, gw] f32, [bq, hpg], [bq, hpg]
        start = kb_idx * bk
        kb_nat = k_ref[0, pl.ds(start, bk), :]
        vb_nat = v_ref[0, pl.ds(start, bk), :]
        kb_ = _block_diag_rows(kb_nat, hpg, d, bk, bk)   # [hpg*bk, gw]
        vb_ = _block_diag_rows(vb_nat, hpg, d, bk, bk)
        bias_b = _block_bias(
            bias_ref[0, :, pl.ds(start, bk)].astype(jnp.float32),
            hpg, bk, bk)               # [1, hpg*bk], pre-scaled by log2e
        s = jax.lax.dot_general(qg, kb_, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale2 \
            + bias_b
        # per-head online-softmax update over this kv block
        p_parts, alpha_band = [], []
        m_new_cols, l_cols = [], []
        for h in range(hpg):
            sh = s[:, h * bk:(h + 1) * bk]
            mh = m[:, h:h + 1]
            mh_new = jnp.maximum(mh, jnp.max(sh, axis=-1, keepdims=True))
            ph = jnp.exp2(sh - mh_new)
            ah = jnp.exp2(mh - mh_new)
            l_cols.append(l[:, h:h + 1] * ah
                          + jnp.sum(ph, axis=-1, keepdims=True))
            m_new_cols.append(mh_new)
            p_parts.append(ph)
            alpha_band.append(jnp.broadcast_to(ah, (bq, d)))
        p = p_parts[0] if hpg == 1 else jnp.concatenate(p_parts, axis=-1)
        if dropout_rate > 0.0:
            keep = _keep_mask(
                seed_ref, _tile_id(i, g, r, kb_idx, n_groups, n_qb, num_kb),
                p.shape, dropout_rate)
            p = jnp.where(keep, p, 0.0)
        alpha = (alpha_band[0] if hpg == 1
                 else jnp.concatenate(alpha_band, axis=-1))  # [bq, gw]
        acc = acc * alpha + jnp.dot(p.astype(vb_.dtype), vb_,
                                    preferred_element_type=jnp.float32)
        m = m_new_cols[0] if hpg == 1 else jnp.concatenate(m_new_cols, -1)
        l = l_cols[0] if hpg == 1 else jnp.concatenate(l_cols, -1)
        return acc, m, l

    if num_kb == 1:
        # Single kv block (the tuned S<=2048 shapes): plain softmax -- no
        # online carries, no alpha rescale of acc, no maximum-with-m0.
        # Saves ~hpg [bq,1] exps + a [bq,gw] f32 multiply + broadcasts per
        # program on a VPU-bound kernel.
        kb_ = _block_diag_rows(k_ref[0], hpg, d, bk, bk)
        vb_ = _block_diag_rows(v_ref[0], hpg, d, bk, bk)
        bias_b = _block_bias(bias_ref[0].astype(jnp.float32), hpg, bk, bk)
        s = jax.lax.dot_general(qg, kb_, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale2 \
            + bias_b
        p_parts, m_cols, l_cols = [], [], []
        for h in range(hpg):
            sh = s[:, h * bk:(h + 1) * bk]
            mh = jnp.max(sh, axis=-1, keepdims=True)
            ph = jnp.exp2(sh - mh)
            l_cols.append(jnp.sum(ph, axis=-1, keepdims=True))
            m_cols.append(mh)
            p_parts.append(ph)
        p = p_parts[0] if hpg == 1 else jnp.concatenate(p_parts, axis=-1)
        if dropout_rate > 0.0:
            keep = _keep_mask(
                seed_ref, _tile_id(i, g, r, 0, n_groups, n_qb, 1),
                p.shape, dropout_rate)
            p = jnp.where(keep, p, 0.0)
        acc = jnp.dot(p.astype(vb_.dtype), vb_,
                      preferred_element_type=jnp.float32)
        m = m_cols[0] if hpg == 1 else jnp.concatenate(m_cols, -1)
        l = l_cols[0] if hpg == 1 else jnp.concatenate(l_cols, -1)
    else:
        acc0 = jnp.zeros((bq, gw), jnp.float32)
        m0 = jnp.full((bq, hpg), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, hpg), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    l_safe = jnp.maximum(l, 1e-30)
    inv_l = jnp.concatenate(
        [jnp.broadcast_to(1.0 / l_safe[:, h:h + 1], (bq, d))
         for h in range(hpg)], axis=-1) if hpg > 1 else 1.0 / l_safe
    if dropout_rate > 0.0:
        acc = acc / (1.0 - dropout_rate)
    o_ref[0] = (acc * inv_l).astype(o_ref.dtype)
    # lse in LOG2 units (m is a base-2 score max): consumed only by the
    # backward kernels below, which recompute p = exp2(s2 - lse)
    lse_ref[0, 0] = (m + jnp.log2(l_safe)).T.astype(jnp.float32)  # [hpg, bq]


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref,
               lse_ref, dq_ref, *, hpg: int, d: int, bk: int, scale: float,
               dropout_rate: float):
    """dQ for one (batch, group, q-block); delta from the do.o band trick."""
    qg = q_ref[0]
    dog = do_ref[0]
    og = o_ref[0]
    bq, gw = qg.shape
    sk = k_ref.shape[1]
    num_kb = sk // bk
    i, g, r = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_groups, n_qb = pl.num_programs(1), pl.num_programs(2)
    scale2 = scale * _LOG2E

    lse = lse_ref[0, 0].astype(jnp.float32)            # [hpg, bq], log2 units
    # one [1, bq] -> [bq, 1] relayout per head, hoisted out of the kv loop
    lse_col = [lse[h:h + 1, :].T for h in range(hpg)]
    doo = dog.astype(jnp.float32) * og.astype(jnp.float32)
    delta = [jnp.sum(doo[:, h * d:(h + 1) * d], axis=-1, keepdims=True)
             for h in range(hpg)]                      # hpg x [bq, 1]
    # Fold the dropout 1/keep into do ONCE per program ([bq, gw] mul):
    # dp then arrives pre-scaled and the per-tile [bq, hpg*bk] mul
    # disappears.  delta uses the UNscaled do above (softmax-vjp identity).
    if dropout_rate > 0.0:
        dog = (dog * (1.0 / (1.0 - dropout_rate))).astype(dog.dtype)

    def body(kb_idx, dq):
        start = kb_idx * bk
        kb_nat = k_ref[0, pl.ds(start, bk), :]
        vb_nat = v_ref[0, pl.ds(start, bk), :]
        kb_ = _block_diag_rows(kb_nat, hpg, d, bk, bk)
        vb_ = _block_diag_rows(vb_nat, hpg, d, bk, bk)
        bias_b = _block_bias(
            bias_ref[0, :, pl.ds(start, bk)].astype(jnp.float32),
            hpg, bk, bk)
        s = jax.lax.dot_general(qg, kb_, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale2 \
            + bias_b
        dp = jax.lax.dot_general(dog, vb_, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _keep_mask(
                seed_ref, _tile_id(i, g, r, kb_idx, n_groups, n_qb, num_kb),
                dp.shape, dropout_rate)
            dp = jnp.where(keep, dp, 0.0)  # 1/keep pre-folded into do
        ds_parts = []
        for h in range(hpg):
            sl = slice(h * bk, (h + 1) * bk)
            ph = jnp.exp2(s[:, sl] - lse_col[h])
            ds_parts.append(ph * (dp[:, sl] - delta[h]))
        ds = (ds_parts[0] if hpg == 1
              else jnp.concatenate(ds_parts, axis=-1)).astype(qg.dtype)
        return dq + jnp.dot(ds, kb_, preferred_element_type=jnp.float32) \
            * scale

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((bq, gw), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref,
                lse_ref, dk_ref, dv_ref, *, hpg: int, d: int, bq: int,
                scale: float, dropout_rate: float):
    """dK/dV for one (batch, group, kv-block); loops q blocks."""
    kb_nat = k_ref[0]                  # [bk, gw]
    vb_nat = v_ref[0]
    bk, gw = kb_nat.shape
    sq = q_ref.shape[1]
    num_qb = sq // bq
    i, g, kb_idx = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_groups, num_kb = pl.num_programs(1), pl.num_programs(2)
    scale2 = scale * _LOG2E

    kb_ = _block_diag_rows(kb_nat, hpg, d, bk, bk)
    vb_ = _block_diag_rows(vb_nat, hpg, d, bk, bk)
    bias_b = _block_bias(bias_ref[0].astype(jnp.float32), hpg, bk, bk)

    def body(qb_idx, carry):
        dkb, dvb = carry               # [hpg*bk, gw] f32
        start = qb_idx * bq
        qg = q_ref[0, pl.ds(start, bq), :]
        dog = do_ref[0, pl.ds(start, bq), :]
        og = o_ref[0, pl.ds(start, bq), :]
        lse = lse_ref[0, 0, :, pl.ds(start, bq)].astype(jnp.float32)
        lse_col = [lse[h:h + 1, :].T for h in range(hpg)]
        doo = dog.astype(jnp.float32) * og.astype(jnp.float32)
        # 1/keep folded into do ONCE ([bq, gw]) -- dp and the dv dot both
        # arrive pre-scaled, deleting two per-tile [bq, hpg*bk] muls.
        # delta (from doo above) uses the UNscaled do.
        if dropout_rate > 0.0:
            dog = (dog * (1.0 / (1.0 - dropout_rate))).astype(dog.dtype)
        s = jax.lax.dot_general(qg, kb_, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale2 \
            + bias_b
        p_parts = []
        for h in range(hpg):
            p_parts.append(jnp.exp2(s[:, h * bk:(h + 1) * bk]
                                    - lse_col[h]))
        p = p_parts[0] if hpg == 1 else jnp.concatenate(p_parts, axis=-1)
        dp = jax.lax.dot_general(dog, vb_, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _keep_mask(
                seed_ref, _tile_id(i, g, qb_idx, kb_idx, n_groups, num_qb,
                                   num_kb),
                p.shape, dropout_rate)
            pd = jnp.where(keep, p, 0.0)
            dpm = jnp.where(keep, dp, 0.0)
        else:
            pd, dpm = p, dp
        ds_parts = []
        for h in range(hpg):
            deltah = jnp.sum(doo[:, h * d:(h + 1) * d], axis=-1,
                             keepdims=True)
            sl = slice(h * bk, (h + 1) * bk)
            ds_parts.append(p[:, sl] * (dpm[:, sl] - deltah))
        ds = (ds_parts[0] if hpg == 1
              else jnp.concatenate(ds_parts, axis=-1)).astype(qg.dtype)
        dvb = dvb + jax.lax.dot_general(
            pd.astype(dog.dtype), dog, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dkb = dkb + jax.lax.dot_general(
            ds, qg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dkb, dvb

    z = jnp.zeros((hpg * bk, gw), jnp.float32)
    dkb, dvb = jax.lax.fori_loop(0, num_qb, body, (z, z))
    dk_ref[0] = _unblock_rows(dkb * scale, hpg, d, bk, bk, dk_ref.dtype)
    dv_ref[0] = _unblock_rows(dvb, hpg, d, bk, bk, dv_ref.dtype)


def _bwd_fused_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                      o_ref, lse_ref, dq_ref, dk_ref, dv_ref, dq_acc, *,
                      hpg: int, d: int, bq: int, bk: int, scale: float,
                      dropout_rate: float):
    """dQ+dK+dV for one (batch, group) program in a single sweep.

    Blocks: q/do/o/dq [1, Sq, gw]; k/v/dk/dv [1, Sk, gw]; bias [1, 1, Sk];
    lse [1, 1, hpg, Sq]; dq_acc VMEM scratch [Sq, gw] f32.  Loops kv blocks
    outer / q blocks inner; p = exp(s - lse) and the dropout mask are
    computed ONCE per (q, kv) tile and feed all three gradients (the split
    kernels each recomputed them).  5 block dots per tile vs the split
    backward's 7.
    """
    sq = q_ref.shape[1]
    sk = k_ref.shape[1]
    gw = q_ref.shape[2]
    num_qb, num_kb = sq // bq, sk // bk
    i, g = pl.program_id(0), pl.program_id(1)
    n_groups = pl.num_programs(1)
    scale2 = scale * _LOG2E
    inv = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0

    dq_acc[...] = jnp.zeros((sq, gw), jnp.float32)

    def kv_body(kb_idx, _):
        start_k = kb_idx * bk
        kb_nat = k_ref[0, pl.ds(start_k, bk), :]
        vb_nat = v_ref[0, pl.ds(start_k, bk), :]
        kb_ = _block_diag_rows(kb_nat, hpg, d, bk, bk)       # [hpg*bk, gw]
        vb_ = _block_diag_rows(vb_nat, hpg, d, bk, bk)
        bias_b = _block_bias(
            bias_ref[0, :, pl.ds(start_k, bk)].astype(jnp.float32),
            hpg, bk, bk)                                     # [1, hpg*bk]

        def q_body(qb_idx, carry):
            dkb, dvb = carry                                 # [hpg*bk, gw] f32
            start_q = qb_idx * bq
            qg = q_ref[0, pl.ds(start_q, bq), :]
            dog = do_ref[0, pl.ds(start_q, bq), :]
            og = o_ref[0, pl.ds(start_q, bq), :]
            s = jax.lax.dot_general(qg, kb_, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) \
                * scale2 + bias_b
            # delta_i = do_i . o_i per head (recomputed per kv block --
            # hpg sums over [bq, d], cheap next to the exp); UNscaled do
            doo = dog.astype(jnp.float32) * og.astype(jnp.float32)
            delta_b = [jnp.sum(doo[:, h * d:(h + 1) * d], axis=-1,
                               keepdims=True) for h in range(hpg)]
            # 1/keep folded into do ONCE ([bq, gw]) -- dp and the dv dot
            # both arrive pre-scaled, deleting two per-tile [bq, hpg*bk]
            # muls from the dropout path (BENCH.md round 4).
            if dropout_rate > 0.0:
                dog = (dog * inv).astype(dog.dtype)
            dp = jax.lax.dot_general(dog, vb_, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            lse_b = lse_ref[0, 0, :, pl.ds(start_q, bq)].astype(jnp.float32)
            lse_col = [lse_b[h:h + 1, :].T for h in range(hpg)]
            p_parts = [jnp.exp2(s[:, h * bk:(h + 1) * bk] - lse_col[h])
                       for h in range(hpg)]
            p = (p_parts[0] if hpg == 1
                 else jnp.concatenate(p_parts, axis=-1))     # [bq, hpg*bk]
            if dropout_rate > 0.0:
                keep = _keep_mask(
                    seed_ref,
                    _tile_id(i, g, qb_idx, kb_idx, n_groups, num_qb, num_kb),
                    p.shape, dropout_rate)
                pd = jnp.where(keep, p, 0.0)   # 1/keep pre-folded into do
                dpm = jnp.where(keep, dp, 0.0)
            else:
                pd, dpm = p, dp
            ds_parts = [
                p_parts[h] * (dpm[:, h * bk:(h + 1) * bk] - delta_b[h])
                for h in range(hpg)
            ]
            ds = (ds_parts[0] if hpg == 1
                  else jnp.concatenate(ds_parts, axis=-1)).astype(qg.dtype)
            dvb = dvb + jax.lax.dot_general(
                pd.astype(dog.dtype), dog, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dkb = dkb + jax.lax.dot_general(
                ds, qg, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_acc[pl.ds(start_q, bq), :] += jax.lax.dot_general(
                ds, kb_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            return dkb, dvb

        z = jnp.zeros((hpg * bk, gw), jnp.float32)
        dkb, dvb = jax.lax.fori_loop(0, num_qb, q_body, (z, z))
        dk_ref[0, pl.ds(start_k, bk), :] = _unblock_rows(
            dkb * scale, hpg, d, bk, bk, dk_ref.dtype)
        dv_ref[0, pl.ds(start_k, bk), :] = _unblock_rows(
            dvb, hpg, d, bk, bk, dv_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_kb, kv_body, 0)
    dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _pad_tokens(x, target):
    if x.shape[1] == target:
        return x
    return jnp.pad(x, ((0, 0), (0, target - x.shape[1]), (0, 0)))


def _padded(q, k, v, key_bias, bq, bk):
    s = q.shape[1]
    sq = _round_up(s, bq)
    sk = _round_up(s, bk)
    # bias enters the kernels pre-scaled into the base-2 score domain
    # (see _LOG2E); the NEG_INF padding constant is equally -inf-like in
    # either domain.  fwd and bwd both pad through here, so they agree.
    bias = jnp.pad(key_bias.astype(jnp.float32) * _LOG2E,
                   ((0, 0), (0, sk - s)),
                   constant_values=NEG_INF)[:, None, :]   # [B, 1, Sk]
    return _pad_tokens(q, sq), _pad_tokens(k, sk), _pad_tokens(v, sk), \
        bias, sq, sk


def _fwd_call(q, k, v, key_bias, seed, num_heads, dropout_rate, interpret,
              with_lse):
    from jax.experimental.pallas import tpu as pltpu

    b, s, h = q.shape
    d = h // num_heads
    hpg = _heads_per_group(num_heads, d)
    gw = hpg * d
    n_groups = num_heads // hpg
    scale = 1.0 / math.sqrt(d)
    bq, bk = _blocks_for(s, _BQ, _BK)
    qp, kp, vp, bias, sq, sk = _padded(q, k, v, key_bias, bq, bk)
    grid = (b, n_groups, sq // bq)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, hpg=hpg, d=d, bk=bk, scale=scale,
                          dropout_rate=dropout_rate),
        out_shape=(
            jax.ShapeDtypeStruct((b, sq, h), q.dtype),
            jax.ShapeDtypeStruct((b, n_groups, hpg, sq), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            smem,
            pl.BlockSpec((1, bq, gw), lambda i, g, r: (i, r, g)),
            pl.BlockSpec((1, sk, gw), lambda i, g, r: (i, 0, g)),
            pl.BlockSpec((1, sk, gw), lambda i, g, r: (i, 0, g)),
            pl.BlockSpec((1, 1, sk), lambda i, g, r: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, gw), lambda i, g, r: (i, r, g)),
            pl.BlockSpec((1, 1, hpg, bq), lambda i, g, r: (i, g, 0, r)),
        ),
        interpret=interpret,
    )(_seed_arg(seed), qp, kp, vp, bias)
    out = out[:, :s, :]
    if with_lse:
        return out, lse
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention2(q, k, v, key_bias, seed=None, num_heads=16,
                     dropout_rate=0.0, interpret=False):
    """q/k/v: [B, S, H] natural layout; key_bias: [B, S] additive mask.

    Returns ctx [B, S, H].  ``seed``: [1] int32 for in-kernel attention
    dropout (TPU only; tiles are (batch, head-group, q-block, kv-block), so
    masks differ from the head-split kernel's -- equally valid draws).

    NOTE: ``key_bias`` is treated as NON-differentiable by this kernel path
    (its cotangent is hard zeros -- correct for the mask-derived padding
    bias it carries today).  A trainable additive bias routed through this
    argument would silently receive zero gradient, unlike the XLA fallback;
    use the fallback or extend the backward kernels first.
    """
    return _fwd_call(q, k, v, key_bias, seed, num_heads, dropout_rate,
                     interpret, with_lse=False)


def _flash2_fwd(q, k, v, key_bias, seed, num_heads, dropout_rate, interpret):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _fwd_call(q, k, v, key_bias, seed, num_heads, dropout_rate,
                         interpret, with_lse=True)
    # Tag BOTH residual outputs here, inside the vjp fwd, so the residual
    # vars ARE the policy-saved named values.  Tagging only at the call
    # site (models/bert.py wraps the return in 'attn_ctx') saves a value
    # one name-op DOWNSTREAM of the residual, and remat re-runs the whole
    # forward kernel to rebuild the raw ``out``/``lse`` -- measured as a
    # 97 ms/step rematted pallas_call at the frame-level shape before this.
    # 'attn_lse' is the softmax stats ([B, G, hpg, Sq] f32, ~2 MB/layer at
    # S=1024); with ctx+lse stashed the backward never re-runs the forward.
    out = checkpoint_name(out, "attn_ctx")
    lse = checkpoint_name(lse, "attn_lse")
    return out, (q, k, v, key_bias, seed, out, lse)


def _flash2_bwd(num_heads, dropout_rate, interpret, residuals, g):
    from jax.experimental.pallas import tpu as pltpu

    q, k, v, key_bias, seed, out, lse = residuals
    b, s, h = q.shape
    d = h // num_heads
    hpg = _heads_per_group(num_heads, d)
    gw = hpg * d
    n_groups = num_heads // hpg
    scale = 1.0 / math.sqrt(d)
    if dropout_rate > 0.0:
        # the dropout tile id is (program, kv-iter)-indexed, so masks only
        # regenerate bit-identical when the backward uses the FORWARD's
        # block decomposition
        bq, bk = _blocks_for(s, _BQ, _BK)
    else:
        bq, bk = _blocks_for(s, _BWD_BQ, _BWD_BK)
    qp, kp, vp, bias, sq, sk = _padded(q, k, v, key_bias, bq, bk)
    # forward may have used different block sizes; lse's padded length is
    # round_up(s, fwd_bq) -- re-pad to this backward's sq
    if lse.shape[-1] != sq:
        lse = lse[..., :s]
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, 0), (0, sq - s)))
    dop = _pad_tokens(g, sq)
    op = _pad_tokens(out, sq)
    seed_a = _seed_arg(seed)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    # The fused program holds full q/k/v/do/o/dq/dk/dv bands plus the f32
    # accumulators and one [bq, hpg*bk] f32 tile set in VMEM; past ~S=2048
    # that overflows the 16 MB scoped budget and the split kernels (which
    # block the kv side) take over.
    itemsize = jnp.dtype(q.dtype).itemsize
    fused_bytes = ((4 * sq + 4 * sk) * gw * itemsize   # bands + outputs
                   + sq * gw * 4                        # dq accumulator
                   + 2 * hpg * bk * gw * 4              # dk/dv accumulators
                   + 4 * bq * hpg * bk * 4)             # live f32 tiles
    # (4 live tiles calibrated against the S=1024 joint shape, which is
    # measured to compile at 12.5 MB by this formula; 6 would wrongly
    # predict an overflow there.)
    if _FUSED_BWD and fused_bytes < 14 * 1024 * 1024:
        qband = pl.BlockSpec((1, sq, gw), lambda i, g_: (i, 0, g_))
        kband = pl.BlockSpec((1, sk, gw), lambda i, g_: (i, 0, g_))
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, hpg=hpg, d=d, bq=bq, bk=bk,
                              scale=scale, dropout_rate=dropout_rate),
            out_shape=(jax.ShapeDtypeStruct((b, sq, h), q.dtype),
                       jax.ShapeDtypeStruct((b, sk, h), k.dtype),
                       jax.ShapeDtypeStruct((b, sk, h), v.dtype)),
            grid=(b, n_groups),
            in_specs=[
                smem, qband, kband, kband,
                pl.BlockSpec((1, 1, sk), lambda i, g_: (i, 0, 0)),
                qband, qband,
                pl.BlockSpec((1, 1, hpg, sq), lambda i, g_: (i, g_, 0, 0)),
            ],
            out_specs=(qband, kband, kband),
            scratch_shapes=[pltpu.VMEM((sq, gw), jnp.float32)],
            interpret=interpret,
        )(seed_a, qp, kp, vp, bias, dop, op, lse)
        dbias = jnp.zeros_like(key_bias)
        dseed = (None if seed is None
                 else np.zeros(seed.shape, dtype=jax.dtypes.float0))
        return dq[:, :s, :], dk[:, :s, :], dv[:, :s, :], dbias, dseed

    qspec = pl.BlockSpec((1, bq, gw), lambda i, g_, r: (i, r, g_))
    kspec = pl.BlockSpec((1, sk, gw), lambda i, g_, r: (i, 0, g_))
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, hpg=hpg, d=d, bk=bk, scale=scale,
                          dropout_rate=dropout_rate),
        out_shape=jax.ShapeDtypeStruct((b, sq, h), q.dtype),
        grid=(b, n_groups, sq // bq),
        in_specs=[
            smem, qspec, kspec, kspec,
            pl.BlockSpec((1, 1, sk), lambda i, g_, r: (i, 0, 0)),
            qspec, qspec,
            pl.BlockSpec((1, 1, hpg, bq), lambda i, g_, r: (i, g_, 0, r)),
        ],
        out_specs=qspec,
        interpret=interpret,
    )(seed_a, qp, kp, vp, bias, dop, op, lse)

    kvspec = pl.BlockSpec((1, bk, gw), lambda i, g_, c: (i, c, g_))
    qfull = pl.BlockSpec((1, sq, gw), lambda i, g_, c: (i, 0, g_))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, hpg=hpg, d=d, bq=bq, scale=scale,
                          dropout_rate=dropout_rate),
        out_shape=(jax.ShapeDtypeStruct((b, sk, h), k.dtype),
                   jax.ShapeDtypeStruct((b, sk, h), v.dtype)),
        grid=(b, n_groups, sk // bk),
        in_specs=[
            smem, qfull, kvspec, kvspec,
            pl.BlockSpec((1, 1, bk), lambda i, g_, c: (i, 0, c)),
            qfull, qfull,
            pl.BlockSpec((1, 1, hpg, sq), lambda i, g_, c: (i, g_, 0, 0)),
        ],
        out_specs=(kvspec, kvspec),
        interpret=interpret,
    )(seed_a, qp, kp, vp, bias, dop, op, lse)

    dbias = jnp.zeros_like(key_bias)
    dseed = (None if seed is None
             else np.zeros(seed.shape, dtype=jax.dtypes.float0))
    return dq[:, :s, :], dk[:, :s, :], dv[:, :s, :], dbias, dseed


flash_attention2.defvjp(_flash2_fwd, _flash2_bwd)
