"""Hardware validation of the natural-layout flash kernel (ops/flash2.py).

Checks on the real TPU (CPU interpret-mode parity lives in
tests/test_flash2.py):

  1. deterministic fwd + grads vs the XLA path at bf16 ulp;
  2. in-kernel dropout: determinism per seed, seed decorrelation, and
     seed-mean unbiasedness.  fwd/bwd mask CONSISTENCY is validated by the
     same-mask oracle in validate_flash2_dropout.py (a finite-difference
     probe was tried first and is numerically hopeless here: the f32
     representation error of the ~1e5-magnitude loss swamps the ~1e-3
     directional signal).

Usage: python benchmarks/validate_flash2.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from msa_tpu.ops.attention import _xla_attention
from msa_tpu.ops.flash2 import flash_attention2


def ref_attention(q, k, v, key_bias, num_heads):
    b, s, h = q.shape
    d = h // num_heads
    split = lambda x: x.reshape(b, s, num_heads, d)
    ctx = _xla_attention(split(q), split(k), split(v),
                         key_bias[:, None, None, :], 0.0, None, True)
    return ctx.reshape(b, s, h)


def main():
    rng = np.random.default_rng(0)
    b, s, h, n = 4, 1024, 1024, 16
    q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h)), jnp.bfloat16)
    mask = np.ones((b, s), np.float32)
    mask[0, 700:] = 0
    mask[1, 100:] = 0
    key_bias = jnp.asarray((1.0 - mask) * -1e9)
    mb = mask.astype(bool)

    # --- 1. deterministic parity ---
    out = jax.jit(lambda *a: flash_attention2(*a, None, n, 0.0, False))(
        q, k, v, key_bias)
    ref = jax.jit(lambda *a: ref_attention(*a, n))(q, k, v, key_bias)
    d_fwd = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                  - ref.astype(jnp.float32))[mb]))

    def loss2(q, k, v):
        o = flash_attention2(q, k, v, key_bias, None, n, 0.0, False)
        return jnp.sum((o.astype(jnp.float32) * mask[:, :, None]) ** 2)

    def lossr(q, k, v):
        o = ref_attention(q, k, v, key_bias, n)
        return jnp.sum((o.astype(jnp.float32) * mask[:, :, None]) ** 2)

    g2 = jax.jit(jax.grad(loss2, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(lossr, argnums=(0, 1, 2)))(q, k, v)
    g_diffs = [float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                     - b_.astype(jnp.float32))))
               for a, b_ in zip(g2, gr)]
    scale = [float(jnp.max(jnp.abs(a.astype(jnp.float32)))) for a in gr]
    print(f"det parity: fwd maxdiff {d_fwd:.4f}; "
          f"grad maxdiff dq/dk/dv {g_diffs} (scales {scale})")
    assert d_fwd < 0.05
    assert all(dd < 0.05 * max(sc, 1.0) for dd, sc in zip(g_diffs, scale))

    # --- 2. dropout ---
    rate = 0.3
    seed = jnp.asarray([1234], jnp.int32)

    f = jax.jit(lambda sd: flash_attention2(q, k, v, key_bias, sd, n,
                                            rate, False))
    o1, o2 = f(seed), f(seed)
    assert bool(jnp.all(o1 == o2)), "dropout not deterministic per seed"
    o3 = f(jnp.asarray([77], jnp.int32))
    frac_same = float(jnp.mean((o1 == o3)[mb].astype(jnp.float32)))
    print(f"dropout: deterministic per seed; seed change alters "
          f"{100 * (1 - frac_same):.1f}% of outputs")
    assert frac_same < 0.9

    # unbiasedness: E[out] over seeds ~= deterministic out
    outs = [f(jnp.asarray([i], jnp.int32)) for i in range(20)]
    mean = sum(o.astype(jnp.float32) for o in outs) / len(outs)
    bias_err = float(jnp.max(jnp.abs(
        (mean - out.astype(jnp.float32))[mb])))
    ref_mag = float(jnp.max(jnp.abs(out.astype(jnp.float32)[mb])))
    print(f"dropout: 20-seed mean vs deterministic maxdiff {bias_err:.3f} "
          f"(output magnitude {ref_mag:.2f})")

    assert bias_err < 0.2 * ref_mag, "dropout mean biased"
    print("ALL OK (mask consistency: run validate_flash2_dropout.py)")


if __name__ == "__main__":
    main()
