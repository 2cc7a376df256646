"""Measure the ones-column bias fold vs separate bias-grad reduces.

Round-2 xprof: the flagship step spends 8.6 ms in bias-grad reduce_sums --
each dense's db = sum(dy) is a separate HBM pass over dy.  The classical
fix folds b into the kernel (W' = [W; b], x' = [x | 1]): db then rides the
dW matmul.  On TPU the cost is that K grows 1024 -> 1025, which pads to
the next lane multiple (1152 for bf16 [*, K] operands) -- +12.5% FLOPs on
every H-K matmul, fwd AND bwd.

This microbench times a 24-layer chain of the encoder's dense shapes
(fwd + bwd, bias-grad included) both ways at the flagship token count, so
BENCH.md can record a measured verdict instead of an estimate.  Layers are
remat'd (like the real step) -- keeping 24x[19200,4096] activations OOMs
the 16G chip.

Usage: python benchmarks/bench_bias_fold.py [--tokens 19200] [--reps 10]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def timed(fn, n, *args):
    out = fn(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tokens", type=int, default=19200,
                   help="total tokens (flagship B=96: 96*40 + 192*80)")
    p.add_argument("--layers", type=int, default=24)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--reps", type=int, default=10)
    args = p.parse_args()
    t, h, i4 = args.tokens, args.hidden, 4 * args.hidden
    key = jax.random.key(0)
    ks = jax.random.split(key, 6)
    x0 = jax.random.normal(ks[0], (t, h), jnp.bfloat16)

    # one encoder layer's matmul skeleton: 4x [h,h] + [h,4h] + [4h,h]
    Wh = jax.random.normal(ks[1], (args.layers, 4, h, h), jnp.bfloat16) * 0.02
    bh = jnp.zeros((args.layers, 4, h), jnp.bfloat16)
    Wi = jax.random.normal(ks[2], (args.layers, h, i4), jnp.bfloat16) * 0.02
    bi = jnp.zeros((args.layers, i4), jnp.bfloat16)
    Wo = jax.random.normal(ks[3], (args.layers, i4, h), jnp.bfloat16) * 0.02
    bo = jnp.zeros((args.layers, h), jnp.bfloat16)

    def chain_sep(params, x):
        Wh, bh, Wi, bi, Wo, bo = params

        def layer(x, p):
            wh, bhl, wi, bil, wo, bol = p
            for j in range(4):
                x = jnp.dot(x, wh[j]) + bhl[j]
            u = jnp.dot(x, wi) + bil
            u = jax.nn.gelu(u, approximate=True)
            x = jnp.dot(u, wo) + bol
            return x, None

        x, _ = jax.lax.scan(jax.checkpoint(layer), x,
                            (Wh, bh, Wi, bi, Wo, bo))
        return jnp.sum(x.astype(jnp.float32))

    # folded: W' = [W; b] with a ones column appended to x each matmul
    Whf = jnp.concatenate([Wh, bh[:, :, None, :]], axis=2)   # [L,4,h+1,h]
    Wif = jnp.concatenate([Wi, bi[:, None, :]], axis=1)      # [L,h+1,4h]
    Wof = jnp.concatenate([Wo, bo[:, None, :]], axis=1)      # [L,4h+1,h]

    def aug(x):
        return jnp.concatenate(
            [x, jnp.ones((x.shape[0], 1), x.dtype)], axis=1)

    def chain_fold(params, x):
        Whf, Wif, Wof = params

        def layer(x, p):
            whf, wif, wof = p
            for j in range(4):
                x = jnp.dot(aug(x), whf[j])
            u = jnp.dot(aug(x), wif)
            u = jax.nn.gelu(u, approximate=True)
            x = jnp.dot(aug(u), wof)
            return x, None

        x, _ = jax.lax.scan(jax.checkpoint(layer), x, (Whf, Wif, Wof))
        return jnp.sum(x.astype(jnp.float32))

    g_sep = jax.jit(jax.grad(chain_sep))
    g_fold = jax.jit(jax.grad(chain_fold))
    f_sep = jax.jit(chain_sep)
    f_fold = jax.jit(chain_fold)

    p_sep = (Wh, bh, Wi, bi, Wo, bo)
    p_fold = (Whf, Wif, Wof)

    def red(g):
        return jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32)), g)

    ts = timed(lambda p: red(g_sep(p, x0)), args.reps, p_sep)
    tf = timed(lambda p: red(g_fold(p, x0)), args.reps, p_fold)
    fs = timed(f_sep, args.reps, p_sep, x0)
    ff = timed(f_fold, args.reps, p_fold, x0)
    print(f"separate bias : fwd {fs*1e3:7.2f} ms   fwd+bwd {ts*1e3:7.2f} ms")
    print(f"ones-col fold : fwd {ff*1e3:7.2f} ms   fwd+bwd {tf*1e3:7.2f} ms")
    print(f"fold delta fwd+bwd: {(tf-ts)*1e3:+.2f} ms "
          f"({(tf/ts-1)*100:+.1f}%)")


if __name__ == "__main__":
    main()
