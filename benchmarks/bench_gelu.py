"""How much does exact (erf) gelu cost vs tanh-approx and bf16-vs-f32 at
the flagship FFN shapes?  The FFN activation is computed 2x per step under
save_small remat (fwd + bwd recompute), so a transcendental-rate delta
shows up doubled in the step.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_gelu.py
"""
import time

import jax
import jax.numpy as jnp


def timed(fn, n, *args):
    r = fn(*args)
    jax.device_get(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    # one joint-pass layer's FFN activation at B=64: [128*80, 4096]
    x = jax.random.normal(jax.random.key(0), (10240, 4096), jnp.bfloat16)
    reps = 30
    layers = 24
    for name, fn in [
        ("erf bf16", lambda x: jax.nn.gelu(x, approximate=False)),
        ("tanh bf16", lambda x: jax.nn.gelu(x, approximate=True)),
        ("erf f32", lambda x: jax.nn.gelu(x.astype(jnp.float32),
                                          approximate=False).astype(jnp.bfloat16)),
        ("relu bf16", jax.nn.relu),
    ]:
        def chain(x):
            for _ in range(layers):
                x = fn(x) * (1.0 / 1.1)  # keep magnitudes stable
            return jnp.sum(x.astype(jnp.float32))
        t = timed(jax.jit(chain), reps, x)
        print(f"{name:10s}: {t:7.3f} ms / {layers} layer-activations "
              f"({t/layers*1000:6.1f} us each)")


if __name__ == "__main__":
    main()
