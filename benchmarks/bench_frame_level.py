"""Frame-level (pair_seq_length) step benchmark + profiler on the real TPU.

The frame-level long-stream mode (SURVEY.md section 5.7 seam; visual/speech
at native frame rate, joint passes over L+Lp tokens, flash kernel) ran at
MFU 0.3455 in round 2 -- below the >=0.40 north star.  This harness times
THAT exact step shape (bert-large, L=40, Lp=984 -> S=1024) under remat /
flash-block / batch variants, and can dump the xprof per-op breakdown.

Usage:
  python benchmarks/bench_frame_level.py --variants ctx16,attn16
  python benchmarks/bench_frame_level.py --bq 256 --bk 512 --variants ctx16
  python benchmarks/bench_frame_level.py --profile --variants ctx16
"""

import argparse
import dataclasses
import json
import time

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_seq_length", type=int, default=40)
    p.add_argument("--pair_seq_length", type=int, default=984)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--variants", default="ctx16")
    p.add_argument("--bq", type=int, default=None,
                   help="flash q-block override")
    p.add_argument("--bk", type=int, default=None,
                   help="flash kv-block override")
    p.add_argument("--profile", action="store_true",
                   help="xprof the first variant and print the top ops")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--natural_softmax", action="store_true",
                   help="A/B: natural-domain exp softmax in short_attention "
                        "(the S=40 text pass here) instead of the exp2 fold")
    p.add_argument("--f32_dropout", action="store_true",
                   help="A/B: f32-uniform bernoulli at the XLA-level "
                        "dropout sites instead of uint8 thresholds "
                        "(round 5)")
    args = p.parse_args()
    variants = args.variants.split(",")

    if args.natural_softmax:
        from msa_tpu.ops import short_attention as sa
        sa._EXP2_SOFTMAX = False
    if args.f32_dropout:
        from msa_tpu.models import bert
        bert._BITS_DROPOUT = False

    from msa_tpu.ops import attention as attn
    from msa_tpu.ops import flash2
    if args.bq is not None:
        attn._FLASH_BQ = args.bq
        flash2._BQ = flash2._BWD_BQ = args.bq
    if args.bk is not None:
        attn._FLASH_BK = args.bk
        flash2._BK = flash2._BWD_BK = args.bk

    from msa_tpu.configs import build_experiment
    from msa_tpu.data.dataset import MultimodalDataset
    from msa_tpu.data.featurize import synthetic_split
    from msa_tpu.training.trainer import Trainer

    exp = build_experiment(dataset="mosi", model_name="bert-large-uncased",
                           num_labels=1, train_batch_size=args.batch_size,
                           compute_dtype="bfloat16", warmup_proportion=0.01)
    exp = dataclasses.replace(
        exp, data=dataclasses.replace(
            exp.data, max_seq_length=args.max_seq_length,
            pair_seq_length=args.pair_seq_length))

    vdim, sdim = exp.model.visual_dim, exp.model.speech_dim
    split = synthetic_split(args.batch_size, args.max_seq_length, vdim, sdim,
                            vocab_size=exp.model.bert.vocab_size, seed=0,
                            pair_seq_length=args.pair_seq_length)
    ds = MultimodalDataset(split, seed=0)

    # variant name -> TrainConfig overrides
    named = {
        "ctx16": dict(remat_policy="save_ctx", adam_mu_dtype="bfloat16"),
        "attn16": dict(remat_policy="save_attn", adam_mu_dtype="bfloat16"),
        "small16": dict(remat_policy="save_small", adam_mu_dtype="bfloat16"),
        "full16": dict(remat_policy="full", adam_mu_dtype="bfloat16"),
        "auto16": dict(remat_policy="auto", adam_mu_dtype="bfloat16"),
        "ctx16nu": dict(remat_policy="save_ctx", adam_mu_dtype="bfloat16",
                        adam_nu_dtype="bfloat16"),
        "ctx16drop": dict(remat_policy="save_ctx+drop",
                          adam_mu_dtype="bfloat16"),
        "ctx16nudrop": dict(remat_policy="save_ctx+drop",
                            adam_mu_dtype="bfloat16",
                            adam_nu_dtype="bfloat16"),
        "ctx16noflash": dict(remat_policy="save_ctx",
                             adam_mu_dtype="bfloat16",
                             use_flash_attention="never"),
        # '+probs' engages only the short kernel (the S=40 text pass here)
        "ctx16nudropprobs": dict(remat_policy="save_ctx+drop+probs",
                                 adam_mu_dtype="bfloat16",
                                 adam_nu_dtype="bfloat16"),
        # scan_unroll=0: python-loop layers -> per-layer residual buffers,
        # no scan-stash dynamic_update_slice/squeeze copies at all
        "ctx16nudropnoscan": dict(remat_policy="save_ctx+drop",
                                  adam_mu_dtype="bfloat16",
                                  adam_nu_dtype="bfloat16", scan_unroll=0),
        # save_attn at frame level stashes q/k/v/ctx bands (4 x [2B, S, H]
        # bf16/layer -- NOT S^2 probs), deleting the QKV share of the
        # remat dots (10.7% of the S=2048 step under save_ctx+drop, xprof)
        "attn16nudrop": dict(remat_policy="save_attn+drop",
                             adam_mu_dtype="bfloat16",
                             adam_nu_dtype="bfloat16"),
        "attn16nudropnoscan": dict(remat_policy="save_attn+drop",
                                   adam_mu_dtype="bfloat16",
                                   adam_nu_dtype="bfloat16", scan_unroll=0),
        # remat AND scan_unroll on full auto: validates the round-5
        # frame-level calibrations pick the winning rung + noscan on the
        # real chip (prints the resolved values below)
        "auto16nunoscan": dict(remat_policy="auto",
                               adam_mu_dtype="bfloat16",
                               adam_nu_dtype="bfloat16", scan_unroll=None),
    }
    # variants predate scan_unroll=None (auto); those not naming it were
    # measured under the scan -- pin that so their numbers stay comparable
    named = {k: {"scan_unroll": 1, **v} for k, v in named.items()}

    results = {}
    for vi, name in enumerate(variants):
        tr = Trainer(dataclasses.replace(
            exp, train=dataclasses.replace(exp.train, **named[name])))
        if named[name].get("remat_policy") == "auto":
            print(f"{name}: auto resolved to "
                  f"remat={tr._resolve_remat_policy()!r} "
                  f"scan_unroll={tr._resolve_scan_unroll()}", flush=True)
        batch = tr._shard_batch(next(ds.epoch_batches(
            0, args.batch_size, drop_last=True)))
        state = tr.init_state(jax.random.key(0), total_steps=10_000)
        step = tr._build_train_step()
        rng = tr.rng(1)
        for _ in range(2):  # incl. donation-relayout recompile
            state, m = step(state, batch, rng)
        float(jax.device_get(m["loss"]))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, batch, rng)
        float(jax.device_get(m["loss"]))
        dt = (time.perf_counter() - t0) / args.steps
        sps = args.batch_size / dt
        mfu = tr.mfu(sps)
        results[name] = dict(step_ms=round(dt * 1e3, 1),
                             samples_per_sec=round(sps, 2),
                             mfu=round(mfu, 4))
        print(f"{name:16s}: {dt*1e3:8.1f} ms/step  {sps:6.2f} samples/s  "
              f"MFU {mfu:.4f}")

        if args.profile and vi == 0:
            import tempfile
            trace_dir = tempfile.mkdtemp(prefix="xprof_frame_")
            with jax.profiler.trace(trace_dir):
                for _ in range(args.steps):
                    state, m = step(state, batch, rng)
                float(jax.device_get(m["loss"]))
            import sys
            sys.path.insert(0, "/root/repo/benchmarks")
            from profile_step import collect_op_profile
            tables = json.loads(collect_op_profile(trace_dir))
            tbl = tables[0] if isinstance(tables, list) else tables
            ids = [c["id"] for c in tbl["cols"]]
            rows = []
            total = 0.0
            for row in tbl["rows"]:
                r = {i: (c or {}).get("v") for i, c in zip(ids, row["c"])}
                if r.get("host_or_device") != "Device":
                    continue
                st = float(r.get("total_self_time") or 0)
                total += st
                rows.append((st, r.get("type", "?"),
                             str(r.get("operation", "?"))[:110]))
            rows.sort(reverse=True)
            print(f"\ndevice total {total/1e3:.1f} ms over {args.steps} steps"
                  f" = {total/args.steps/1e3:.1f} ms/step")
            for st, typ, op in rows[: args.top]:
                print(f"{st/args.steps/1e3:9.3f}  {100*st/total:5.1f}  "
                      f"[{typ}] {op}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
