"""On-TPU validation: short_attention_v2 with in-kernel dropout vs a
pure-JAX reference using the EXACT mask the kernel generates.

v2 seeds the TPU PRNG per (batch, head-GROUP) tile over the block-packed
[S, hpg*Sp] probs layout (tile_id = b * n_groups + g); head p inside the
group reads keep-mask columns [p*Sp, p*Sp + S).  The oracle exports those
tiles with a helper kernel and reproduces the dropped-softmax attention in
plain JAX.  Run on the real TPU (tests/ force CPU, no TPU PRNG there).

Expected scale (f32 inputs on v5e): fwd/dv maxdiff <= ~1e-3, dq/dk <= 2e-4.
These are f32-on-MXU default-precision roundoff, NOT mask error: the mask
identity itself is pinned bit-exactly (validate_short_probs.py compares the
kernel's own sign-stashed keep decisions against these dumped tiles and the
round-4 probe measured 0 mismatches in 92800; an f64 reconstruction showed
~1e-3 dot error on BOTH the kernel and the XLA oracle, which merely used to
cancel bit-for-bit under the pre-round-4 u32 threshold).
"""
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from msa_tpu.ops.short_attention import (_heads_per_group, _keep_mask,
                                         _round_up, short_attention_v2)

b, s, h, n = 4, 80, 256, 4   # d=64 -> hpg=2, 2 groups, Sp=128
d = h // n
hpg = _heads_per_group(n, d)
sp = _round_up(s, 128)
n_groups = n // hpg
from msa_tpu.ops.short_attention import quantize_dropout_rate as _q
rate = _q(0.3)  # snapped to 77/256 -- the kernel's 8-bit threshold path
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
k = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
v = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
maskrow = np.ones((b, s), np.float32); maskrow[1, 50:] = 0
key_bias = jnp.asarray((1.0 - maskrow) * -1e9)
seed = jnp.array([99], jnp.int32)

def mask_kernel(seed_ref, tid_ref, o_ref):
    keep = _keep_mask(seed_ref, tid_ref[0], (s, hpg * sp), rate)
    o_ref[...] = keep.astype(jnp.float32)

def tile_mask(tid):
    return pl.pallas_call(
        mask_kernel,
        out_shape=jax.ShapeDtypeStruct((s, hpg * sp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(seed, jnp.array([tid], jnp.int32))

# per-head [S, S] keep masks extracted from the group tiles
M = np.zeros((b, n, s, s), np.float32)
for i in range(b):
    for g in range(n_groups):
        tile = np.asarray(tile_mask(i * n_groups + g))
        for p in range(hpg):
            M[i, g * hpg + p] = tile[:, p * sp : p * sp + s]
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

out_f = short_attention_v2(q, k, v, key_bias, seed, n, rate, False)
out_r = ref(q, k, v)
print("fwd maxdiff:", float(jnp.max(jnp.abs(out_f - out_r))))
keep_frac = float(jnp.mean(M))
print("keep fraction:", keep_frac, "(expect ~0.7)")
g = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
gf = jax.grad(lambda q, k, v: jnp.sum(
    short_attention_v2(q, k, v, key_bias, seed, n, rate, False) * g), (0, 1, 2))(q, k, v)
gr = jax.grad(lambda q, k, v: jnp.sum(ref(q, k, v) * g), (0, 1, 2))(q, k, v)
for name, a, b_ in zip("q k v".split(), gf, gr):
    print(f"d{name} maxdiff:", float(jnp.max(jnp.abs(a - b_))))
