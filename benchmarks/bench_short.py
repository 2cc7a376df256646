"""Microbenchmark the short_attention kernel at the flagship shapes.

Times fwd and fwd+bwd for the S=40 text pass and the S=80 joint pass
(B as in the B=64 flagship step: text [64,40,1024], joint [128,80,1024]),
against the XLA attention path, using pipelined reps + scalar-fetch sync.

Usage: PYTHONPATH=. python benchmarks/bench_short.py [--impl v1,v2,xla]
"""

import argparse
import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, n, *args):
    r = fn(*args)
    jax.device_get(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / n * 1e3


def xla_attn(q, k, v, bias, num_heads):
    b, s, h = q.shape
    d = h // num_heads
    qh = q.reshape(b, s, num_heads, d)
    kh = k.reshape(b, s, num_heads, d)
    vh = v.reshape(b, s, num_heads, d)
    scores = jnp.einsum("bqnd,bknd->bnqk", qh, kh,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(d) + bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs.astype(q.dtype), vh,
                     preferred_element_type=q.dtype)
    return ctx.reshape(b, s, h)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", default="v1,xla")
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--batch", type=int, default=64,
                   help="flagship text batch B (joint runs at 2B)")
    p.add_argument("--bwd_rows", type=int, default=None,
                   help="override _V2_BWD_ROWS for the v2/v2p backward")
    p.add_argument("--v2_bwd", action="store_true",
                   help="use the old v2 backward (p*dp delta) instead of v3")
    p.add_argument("--layers", type=int, default=8,
                   help="chain this many attention calls per jit (amortize "
                        "dispatch like the 24-layer scan does)")
    p.add_argument("--dropout", type=float, default=0.1)
    args = p.parse_args()
    impls = args.impl.split(",")

    from msa_tpu.ops import short_attention as sa
    from msa_tpu.ops.short_attention import short_attention

    if args.bwd_rows is not None:
        sa._V2_BWD_ROWS = args.bwd_rows
    if args.v2_bwd:
        sa._USE_V3_BWD = False

    key = jax.random.key(0)
    shapes = [("text", args.batch, 40), ("joint", 2 * args.batch, 80)]
    H, N = 1024, 16

    for name, b, s in shapes:
        ks = jax.random.split(jax.random.fold_in(key, b), 4)
        q = jax.random.normal(ks[0], (b, s, H), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, H), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, H), jnp.bfloat16)
        bias = jnp.where(jnp.arange(s)[None, :] < s - 4, 0.0, -1e9
                         ) * jnp.ones((b, 1))
        seed = jnp.array([7], jnp.int32)

        def chain(fn):
            def run(q, k, v):
                x = q
                for i in range(args.layers):
                    x = fn(x, k, v)
                return jnp.sum(x.astype(jnp.float32))
            return run

        def chain_grad(fn):
            def run(q, k, v):
                def loss(q):
                    x = q
                    for i in range(args.layers):
                        x = fn(x, k, v)
                    return jnp.sum(x.astype(jnp.float32))
                return jax.grad(loss)(q).sum()
            return run

        for impl in impls:
            if impl == "xla":
                fn = lambda q, k, v: xla_attn(q, k, v, bias, N)
            elif impl == "v1":
                fn = lambda q, k, v: short_attention(
                    q, k, v, bias, seed, N, args.dropout)
            elif impl == "v2":
                from msa_tpu.ops.short_attention import short_attention_v2
                fn = lambda q, k, v: short_attention_v2(
                    q, k, v, bias, seed, N, args.dropout)
            elif impl == "v2p":
                from msa_tpu.ops.short_attention import short_attention_v2p
                fn = lambda q, k, v: short_attention_v2p(
                    jnp.concatenate([q, k, v], axis=-1), bias, seed, N,
                    args.dropout)
            else:
                continue
            f = jax.jit(chain(fn))
            g = jax.jit(chain_grad(fn))
            tf = timed(f, args.reps, q, k, v) / args.layers
            tg = timed(g, args.reps, q, k, v) / args.layers
            print(f"{name} [{b},{s},{H}] {impl:4s}: "
                  f"fwd {tf:7.3f} ms/layer   fwd+bwd {tg:7.3f} ms/layer")


if __name__ == "__main__":
    main()
