"""flash2 kernel microbench at the frame-level joint shape.

Times the natural-layout lane-packed kernel (ops/flash2.py) against the
old head-split kernel (ops/attention.py::_flash_attention incl. its
dispatch transposes) at the EXACT shape the frame-level step runs:
joint pass [2B, L+Lp, H] = [32, 1024, 1024], 16 heads.  Sweeps fwd and
bwd block sizes.  Sync discipline: scalar reduce inside jit, pipelined
reps, one device_get.

    python benchmarks/bench_flash2.py --dropout 0.1
    python benchmarks/bench_flash2.py --sweep
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 10


def make(b, s, h, seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, h)), dtype)
    k = jnp.asarray(rng.standard_normal((b, s, h)), dtype)
    v = jnp.asarray(rng.standard_normal((b, s, h)), dtype)
    mask = np.ones((b, s), np.float32)
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--sweep", action="store_true")
    p.add_argument("--old", action="store_true", help="also time the old kernel")
    p.add_argument("--split_bwd", action="store_true",
                   help="use the split dq/dkv backward instead of the fused one")
    p.add_argument("--table", action="store_true",
                   help="flash2 vs XLA across S (the BENCH.md flash table)")
    args = p.parse_args()

    from msa_tpu.ops import flash2
    from msa_tpu.ops.attention import _flash_attention
    if args.split_bwd:
        flash2._FUSED_BWD = False

    b, s, h, n = args.batch, args.seq, args.hidden, args.heads
    d = h // n
    q, k, v, key_bias = make(b, s, h)
    seed = (jnp.asarray([7], jnp.int32) if args.dropout > 0 else None)
    rate = args.dropout
    # fwd+bwd FLOPs: fwd 4*b*n*s^2*d; bwd adds 5 dots of the same shape
    tf_fwd = 4 * b * n * s * s * d / 1e12
    tf_bwd = tf_fwd * (1 + 5 / 2)

    def run_flash2(bq, bk, bwd_bq, bwd_bk):
        flash2._BQ, flash2._BK = bq, bk
        flash2._BWD_BQ, flash2._BWD_BK = bwd_bq, bwd_bk

        @jax.jit
        def f(q, k, v):
            return flash2.flash_attention2(
                q, k, v, key_bias, seed, n, rate, False
            ).astype(jnp.float32).sum()

        @jax.jit
        def g(q, k, v):
            gr = jax.grad(lambda *a: flash2.flash_attention2(
                *a, key_bias, seed, n, rate, False
            ).astype(jnp.float32).sum(), argnums=(0, 1, 2))(q, k, v)
            return sum(x.astype(jnp.float32).sum() for x in gr)

        tf_, tg_ = timed(f, q, k, v), timed(g, q, k, v)
        print(f"flash2 bq={bq} bk={bk} bwd={bwd_bq}/{bwd_bk}: "
              f"fwd {tf_:7.2f} ms ({tf_fwd / tf_ * 1e3:5.1f} TF/s)  "
              f"fwd+bwd {tg_:7.2f} ms ({tf_bwd / tg_ * 1e3:5.1f} TF/s)")
        return tf_, tg_

    if args.old:
        def t(x):
            return x.reshape(b, s, n, d).transpose(0, 2, 1, 3)

        @jax.jit
        def f_old(q, k, v):
            out = _flash_attention(t(q), t(k), t(v), key_bias, seed,
                                   512, 512, rate)
            return out.astype(jnp.float32).sum()

        @jax.jit
        def g_old(q, k, v):
            gr = jax.grad(lambda qx, kx, vx: _flash_attention(
                t(qx), t(kx), t(vx), key_bias, seed, 512, 512, rate
            ).astype(jnp.float32).sum(), argnums=(0, 1, 2))(q, k, v)
            return sum(x.astype(jnp.float32).sum() for x in gr)

        to_f, to_g = timed(f_old, q, k, v), timed(g_old, q, k, v)
        print(f"old head-split (incl transposes): fwd {to_f:7.2f} ms "
              f"({tf_fwd / to_f * 1e3:5.1f} TF/s)  fwd+bwd {to_g:7.2f} ms "
              f"({tf_bwd / to_g * 1e3:5.1f} TF/s)")

    if args.table:
        # flash2 vs XLA across S (regenerates BENCH.md's flash table).
        from msa_tpu.ops.attention import _xla_attention

        bt = 4  # the round-2 table's batch; XLA S^2 probs OOM at B=32/S=4096
        for s_ in (1024, 1536, 2048, 4096):
            qs, ks, vs, kb = make(bt, s_, h)
            tf_fwd_s = 4 * bt * n * s_ * s_ * d / 1e12
            tf_bwd_s = tf_fwd_s * (1 + 5 / 2)

            @jax.jit
            def f2(q, k, v, kb=kb):
                return flash2.flash_attention2(
                    q, k, v, kb, seed, n, rate, False
                ).astype(jnp.float32).sum()

            @jax.jit
            def g2(q, k, v, kb=kb):
                gr = jax.grad(lambda *a: flash2.flash_attention2(
                    *a, kb, seed, n, rate, False
                ).astype(jnp.float32).sum(), argnums=(0, 1, 2))(q, k, v)
                return sum(x.astype(jnp.float32).sum() for x in gr)

            def xla(q, k, v, kb=kb, s_=s_):
                t = lambda x: x.reshape(bt, s_, n, d)   # [B, S, N, D]
                o = _xla_attention(t(q), t(k), t(v), kb[:, None, None, :],
                                   0.0, None, True)
                return o.astype(jnp.float32).sum()

            @jax.jit
            def gx(q, k, v):
                gr = jax.grad(xla, argnums=(0, 1, 2))(q, k, v)
                return sum(x.astype(jnp.float32).sum() for x in gr)

            t_f2 = timed(f2, qs, ks, vs)
            t_g2 = timed(g2, qs, ks, vs)
            t_fx = timed(jax.jit(xla), qs, ks, vs)
            t_gx = timed(gx, qs, ks, vs)
            print(f"S={s_}: flash2 fwd {t_f2:7.2f} ({tf_fwd_s/t_f2*1e3:5.1f}"
                  f" TF/s) fwd+bwd {t_g2:7.2f} ({tf_bwd_s/t_g2*1e3:5.1f})"
                  f" | XLA fwd {t_fx:7.2f} fwd+bwd {t_gx:7.2f}")
        return

    if args.sweep:
        for bq in (256, 512, 1024):
            for bk in (512, 1024):
                if rate > 0:
                    run_flash2(bq, bk, bq, bk)
                else:
                    run_flash2(bq, bk, 256, 512)
        if rate == 0:
            for bwd_bq in (128, 256, 512):
                for bwd_bk in (512, 1024):
                    run_flash2(512, 512, bwd_bq, bwd_bk)
    else:
        run_flash2(flash2._BQ, flash2._BK, flash2._BWD_BQ, flash2._BWD_BK)


if __name__ == "__main__":
    main()
