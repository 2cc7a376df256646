"""Flash kernel vs XLA attention: fwd and fwd+bwd across S and block sizes.

Regenerates BENCH.md's flash table on the real TPU.  Sync discipline: jit
returns a scalar (fetching tensors times the tunnel), pipelined reps.

    python benchmarks/bench_flash.py [--sweep] [--dropout 0.1]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from msa_tpu.ops.attention import _flash_attention, _xla_attention

B, N, D = 4, 16, 64
REPS = 10


def make(s, seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, N, s, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, N, s, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, N, s, D)), dtype)
    mask = np.ones((B, s), np.float32)
    mask[0, s // 2:] = 0
    key_bias = jnp.asarray((1.0 - mask) * -1e9)
    return q, k, v, key_bias


def timed(fn, *args):
    fn(*args)
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / REPS * 1e3


def run(s, bq, bk, dropout, seed_arr):
    q, k, v, key_bias = make(s)

    @jax.jit
    def flash_f(q, k, v):
        return _flash_attention(q, k, v, key_bias, seed_arr, bq, bk,
                                dropout).astype(jnp.float32).sum()

    @jax.jit
    def flash_g(q, k, v):
        g = jax.grad(lambda *a: _flash_attention(
            *a, key_bias, seed_arr, bq, bk, dropout).astype(jnp.float32).sum(),
            argnums=(0, 1, 2))(q, k, v)
        return sum(x.astype(jnp.float32).sum() for x in g)

    @jax.jit
    def xla_f(q, k, v):
        bias4 = key_bias[:, None, None, :]
        t = lambda x: x.transpose(0, 2, 1, 3)
        return _xla_attention(t(q), t(k), t(v), bias4, 0.0, None,
                              True).astype(jnp.float32).sum()

    @jax.jit
    def xla_g(q, k, v):
        bias4 = key_bias[:, None, None, :]
        t = lambda x: x.transpose(0, 2, 1, 3)
        g = jax.grad(lambda *a: _xla_attention(
            t(a[0]), t(a[1]), t(a[2]), bias4, 0.0, None,
            True).astype(jnp.float32).sum(), argnums=(0, 1, 2))(q, k, v)
        return sum(x.astype(jnp.float32).sum() for x in g)

    return (timed(flash_f, q, k, v), timed(xla_f, q, k, v),
            timed(flash_g, q, k, v), timed(xla_g, q, k, v))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sweep", action="store_true",
                   help="block-size sweep instead of the headline table")
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--seqs", default="512,1024,2048,4096")
    args = p.parse_args()
    seed_arr = (jnp.asarray([7], jnp.int32) if args.dropout > 0 else None)

    seqs = [int(x) for x in args.seqs.split(",")]
    if args.sweep:
        for s in seqs:
            for bq in (128, 256, 512):
                for bk in (128, 256, 512):
                    if bq > s or bk > s:
                        continue
                    ff, xf, fg, xg = run(s, bq, bk, args.dropout, seed_arr)
                    print(f"S={s} bq={bq} bk={bk}: fwd {ff:7.2f} "
                          f"(xla {xf:7.2f})  fwd+bwd {fg:7.2f} (xla {xg:7.2f})")
    else:
        print(f"B={B} N={N} D={D} dropout={args.dropout} (ms, {REPS} reps)")
        print(f"{'S':>5} {'flash fwd':>10} {'xla fwd':>9} {'flash f+b':>10} {'xla f+b':>9}")
        for s in seqs:
            bq = bk = min(512, max(128, s // 4))
            ff, xf, fg, xg = run(s, bq, bk, args.dropout, seed_arr)
            print(f"{s:>5} {ff:>10.2f} {xf:>9.2f} {fg:>10.2f} {xg:>9.2f}")


if __name__ == "__main__":
    main()
