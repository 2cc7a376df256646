"""On-TPU validation: flash2 in-kernel dropout vs a pure-JAX reference
using the EXACT masks the kernel generates (same-mask oracle).

flash2 seeds the TPU PRNG per (batch, head-group, q-block, kv-block) tile
over the lane-packed [bq, hpg*bk] probs block (ops/flash2.py::_tile_id);
head p inside the group reads keep-mask columns [p*bk, (p+1)*bk).  The
oracle exports every tile with a helper kernel and reproduces the
dropped-softmax attention in plain JAX -- any fwd/bwd mask mismatch or
math error shows up as a fwd or gradient diff.  Block sizes are overridden
to 128 so a short sequence still exercises MULTI-BLOCK tiles in both
backward kernels.  Run on the real TPU (tests/ force CPU, no TPU PRNG).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/validate_flash2_dropout.py

Expected scale on v5e (f32 inputs): fwd ~3e-3, dq/dk/dv ~4-7e-3 relative
to grad scale.  The round-4 1/keep-into-do fold roughly doubled these
diffs WITHOUT losing accuracy: scaling `do` changes the operand's bf16
decomposition inside the default-precision f32 MXU dot, so kernel and
oracle no longer round identically (cancellation loss; BENCH.md round 4).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msa_tpu.ops import flash2
from msa_tpu.ops.flash2 import _tile_id, flash_attention2
from msa_tpu.ops.short_attention import _heads_per_group, _keep_mask

# 128-blocks: s=256 -> 2 q-blocks x 2 kv-blocks per (batch, group)
flash2._BQ = flash2._BK = 128
flash2._BWD_BQ = flash2._BWD_BK = 128

b, s, h, n = 2, 256, 256, 4   # d=64 -> hpg=2, 2 groups
bq = bk = 128
d = h // n
hpg = _heads_per_group(n, d)
n_groups = n // hpg
n_qb, n_kb = s // bq, s // bk
from msa_tpu.ops.short_attention import quantize_dropout_rate as _q
rate = _q(0.3)  # snapped to 77/256 -- the kernel's 8-bit threshold path
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
k = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
v = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
maskrow = np.ones((b, s), np.float32)
maskrow[1, 200:] = 0
key_bias = jnp.asarray((1.0 - maskrow) * -1e9)
seed = jnp.array([99], jnp.int32)


def mask_kernel(seed_ref, tid_ref, o_ref):
    keep = _keep_mask(seed_ref, tid_ref[0], (bq, hpg * bk), rate)
    o_ref[...] = keep.astype(jnp.float32)


def tile_mask(tid):
    return pl.pallas_call(
        mask_kernel,
        out_shape=jax.ShapeDtypeStruct((bq, hpg * bk), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(seed, jnp.array([tid], jnp.int32))


# per-head [S, S] keep masks assembled from the (i, g, r, kb) tiles
M = np.zeros((b, n, s, s), np.float32)
for i in range(b):
    for g in range(n_groups):
        for r in range(n_qb):
            for kb_i in range(n_kb):
                tid = _tile_id(i, g, r, kb_i, n_groups, n_qb, n_kb)
                tile = np.asarray(tile_mask(tid))
                for p in range(hpg):
                    M[i, g * hpg + p,
                      r * bq:(r + 1) * bq,
                      kb_i * bk:(kb_i + 1) * bk] = \
                        tile[:, p * bk:(p + 1) * bk]
M = jnp.asarray(M)


def ref(q, k, v):
    qh = q.reshape(b, s, n, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, n, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, n, d).transpose(0, 2, 1, 3)
    s_ = jnp.einsum("bnqd,bnkd->bnqk", qh, kh) / np.sqrt(d)
    s_ = s_ + key_bias[:, None, None, :]
    P = jax.nn.softmax(s_, axis=-1)
    Pm = P * M / (1.0 - rate)
    ctx = jnp.einsum("bnqk,bnkd->bnqd", Pm, vh)
    return ctx.transpose(0, 2, 1, 3).reshape(b, s, h)


out_f = jax.jit(lambda q, k, v: flash_attention2(
    q, k, v, key_bias, seed, n, rate, False))(q, k, v)
out_r = jax.jit(ref)(q, k, v)
mb = maskrow.astype(bool)
d_fwd = float(jnp.max(jnp.abs(out_f - out_r)[mb]))
print("fwd maxdiff:", d_fwd)
keep_frac = float(jnp.mean(M))
print("keep fraction:", keep_frac, "(expect ~0.7)")
g = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
g = g * maskrow[:, :, None]
gf = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
    flash_attention2(q, k, v, key_bias, seed, n, rate, False) * g),
    (0, 1, 2)))(q, k, v)
gr = jax.jit(jax.grad(lambda q, k, v: jnp.sum(ref(q, k, v) * g),
                      (0, 1, 2)))(q, k, v)
ok = d_fwd < 5e-3 and abs(keep_frac - (1 - rate)) < 0.02
for name, a, b_ in zip("q k v".split(), gf, gr):
    dd = float(jnp.max(jnp.abs(a - b_)))
    sc = float(jnp.max(jnp.abs(b_)))
    print(f"d{name} maxdiff: {dd:.6f} (scale {sc:.3f})")
    ok = ok and dd < 5e-3 * max(sc, 1.0)
print("ALL OK" if ok else "MISMATCH")
assert ok
