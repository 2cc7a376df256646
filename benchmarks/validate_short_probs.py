"""On-TPU validation: short_attention_v2s (the '+probs' stash backward) vs
short_attention_v2 (the recompute backward) with in-kernel dropout ACTIVE.

Both entries run the identical forward math with identical PRNG tiles, so
their gradients must agree to f32 roundoff: v2's backward re-derives the
f32 probs + masks in-VMEM; v2s's backward reads the signed-probs stash
(sign = keep decision) written by its forward.  Run on the real TPU
(tests/ force CPU, where the TPU PRNG is unavailable -- the rate-0 f32
exactness is pinned in tests/test_short_attention.py).
"""
import jax
import jax.numpy as jnp
import numpy as np

from msa_tpu.ops.short_attention import (
    quantize_dropout_rate,
    short_attention_v2,
    short_attention_v2s,
)

b, s, h, n = 4, 80, 256, 4   # d=64 -> hpg=2, 2 groups
rate = quantize_dropout_rate(0.3)
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
k = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
v = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
maskrow = np.ones((b, s), np.float32)
maskrow[1, 50:] = 0
key_bias = jnp.asarray((1.0 - maskrow) * -1e9)
seed = jnp.array([99], jnp.int32)
g = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)

out_v2 = short_attention_v2(q, k, v, key_bias, seed, n, rate, False)
out_v2s = short_attention_v2s(q, k, v, key_bias, seed, n, rate, False)
print("fwd maxdiff (primal):", float(jnp.max(jnp.abs(out_v2 - out_v2s))))

g2 = jax.grad(lambda a, b_, c: jnp.sum(
    short_attention_v2(a, b_, c, key_bias, seed, n, rate, False) * g),
    (0, 1, 2))(q, k, v)
g2s = jax.grad(lambda a, b_, c: jnp.sum(
    short_attention_v2s(a, b_, c, key_bias, seed, n, rate, False) * g),
    (0, 1, 2))(q, k, v)
for name, a, b_ in zip("q k v".split(), g2s, g2):
    print(f"d{name} maxdiff vs v2:", float(jnp.max(jnp.abs(a - b_))))

# bf16: the stash rounds the probs; grads must still track at bf16 scale
qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
g2b = jax.grad(lambda a, b_, c: jnp.sum(
    (short_attention_v2(a, b_, c, key_bias, seed, n, rate, False)
     * g.astype(jnp.bfloat16)).astype(jnp.float32)), (0, 1, 2))(qb, kb, vb)
g2sb = jax.grad(lambda a, b_, c: jnp.sum(
    (short_attention_v2s(a, b_, c, key_bias, seed, n, rate, False)
     * g.astype(jnp.bfloat16)).astype(jnp.float32)), (0, 1, 2))(qb, kb, vb)
for name, a, b_ in zip("q k v".split(), g2sb, g2b):
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32))))
    print(f"d{name} bf16 maxdiff vs v2:", d)
