"""On-TPU validation: short_attention with in-kernel dropout vs a pure-JAX
reference using the EXACT mask the kernel generates (exported via a helper
kernel).  Same methodology as validate_flash_dropout.py (the same-mask
oracle; jax.test_util.check_grads is numerically useless here).  Run on the
real TPU (tests/ force CPU, where the TPU PRNG is absent).
"""
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from msa_tpu.ops.short_attention import _keep_mask, short_attention

b, s, h, n = 4, 80, 256, 4   # d=64 -> 2-head lane groups
d = h // n
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
    keep = _keep_mask(seed_ref, tid_ref[0], (s, s), rate)
    o_ref[...] = keep.astype(jnp.float32)

def tile_mask(tid):
    return pl.pallas_call(
        mask_kernel,
        out_shape=jax.ShapeDtypeStruct((s, s), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(seed, jnp.array([tid], jnp.int32))

# the kernel seeds per (batch, head): tile_id = b*num_heads + head
M = np.zeros((b, n, s, s), np.float32)
for i in range(b):
    for j in range(n):
        M[i, j] = np.asarray(tile_mask(i * n + j))
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

out_f = short_attention(q, k, v, key_bias, seed, n, rate, False)
out_r = ref(q, k, v)
print("fwd maxdiff:", float(jnp.max(jnp.abs(out_f - out_r))))
keep_frac = float(jnp.mean(M))
print("keep fraction:", keep_frac, "(expect ~0.7)")
g = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
gf = jax.grad(lambda q, k, v: jnp.sum(
    short_attention(q, k, v, key_bias, seed, n, rate, False) * g), (0, 1, 2))(q, k, v)
gr = jax.grad(lambda q, k, v: jnp.sum(ref(q, k, v) * g), (0, 1, 2))(q, k, v)
for name, a, b_ in zip("q k v".split(), gf, gr):
    print(f"d{name} maxdiff:", float(jnp.max(jnp.abs(a - b_))))
