"""Microbench: split vs fused Q/K/V projection shapes on the real TPU.

Round-1 measurement: a chain of [5120,1024]x[1024,1024] matmuls inside one
jit runs at ~50-62 TF/s effective on this v5e — the encoder's limiting rate.
Question for round 2 (VERDICT item 2): does widening the projection to one
[1024,3072] matmul (or a stacked [3,1024,1024] dot_general) lift that rate?

Methodology (BENCH.md): everything inside one jit, data-dependent chain so
XLA cannot reorder/delete, REDUCE TO A SCALAR inside the jit (fetching a
full output tensor times the tunnel, not the chip), pipeline REPS calls and
sync once via device_get (block_until_ready does not block on axon).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

M, H = 5120, 1024
LAYERS = 24
REPS = 20


def timed(fn, *args):
    fn(*args)  # compile
    jax.device_get(fn(*args))  # warmup post-compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, H)), jnp.bfloat16)
    w_split = jnp.asarray(rng.standard_normal((LAYERS, 3, H, H)) * 0.02, jnp.bfloat16)
    w_fused = jnp.asarray(np.moveaxis(np.asarray(w_split, np.float32), 1, 2)
                          .reshape(LAYERS, H, 3 * H), jnp.bfloat16)

    flops = LAYERS * 3 * 2 * M * H * H  # identical math in every variant

    @jax.jit
    def split(x, w):
        def body(h, wl):
            q = jnp.dot(h, wl[0])
            k = jnp.dot(h, wl[1])
            v = jnp.dot(h, wl[2])
            return (q + k + v) * 0.01, None
        h, _ = jax.lax.scan(body, x, w)
        return h.sum()

    @jax.jit
    def fused(x, w):
        def body(h, wl):
            qkv = jnp.dot(h, wl)  # [M, 3H]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            return (q + k + v) * 0.01, None
        h, _ = jax.lax.scan(body, x, w)
        return h.sum()

    @jax.jit
    def stacked(x, w):
        def body(h, wl):  # wl: [3, H, H]
            qkv = jax.lax.dot_general(h, wl, (((1,), (1,)), ((), ())))  # [M,3,H]
            return qkv.sum(axis=1) * 0.01, None
        h, _ = jax.lax.scan(body, x, w)
        return h.sum()

    @jax.jit
    def concat_in_body(x, w):
        def body(h, wl):  # wl: [3, H, H] -> concat to [H, 3H] in the body
            wc = jnp.concatenate([wl[0], wl[1], wl[2]], axis=-1)
            qkv = jnp.dot(h, wc)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            return (q + k + v) * 0.01, None
        h, _ = jax.lax.scan(body, x, w)
        return h.sum()

    for name, fn, w in [("split 3x[1024,1024]   ", split, w_split),
                        ("fused [1024,3072]     ", fused, w_fused),
                        ("stacked [3,1024,1024] ", stacked, w_split),
                        ("concat-in-body        ", concat_in_body, w_split)]:
        dt = timed(fn, x, w)
        print(f"{name}: {dt*1e3:8.3f} ms  -> {flops/dt/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
