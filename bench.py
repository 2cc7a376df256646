"""Benchmark: MMBert (bert-large, tri-modal MOSI) training throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

The reference publishes no numbers (SURVEY.md section 6); the baseline is
the bug-fixed reference semantics timed in torch on this machine
(benchmarks/torch_baseline.py writes benchmarks/torch_baseline.json).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="bert-large-uncased")
    # B=96 is the measured sweet spot on v5e with save_attn remat (BENCH.md
    # round 2: 265.4 samples/s; plateau 96-120, B=64 257.1, B=128 OOMs
    # save_attn and drops to 213.9 under full remat).
    p.add_argument("--batch_size", type=int, default=96)
    p.add_argument("--max_seq_length", type=int, default=40)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--flash", default="auto")
    p.add_argument("--adam_mu_dtype", default="bfloat16",
                   help="bf16 mu halves the bandwidth-bound update's moment "
                        "traffic; float32 for bit-exact torch parity")
    p.add_argument("--adam_nu_dtype", default="bfloat16",
                   help="bf16 nu shaves the remaining optimizer-state "
                        "traffic; quality-gated by tests/test_nu16_quality.py "
                        "(loss trajectories track f32 within 5%% over 30 "
                        "steps); float32 for bit-exact torch parity")
    p.add_argument("--remat_policy", default=None,
                   help="override remat_policy (default: the config's auto)")
    p.add_argument("--skip_serving", action="store_true",
                   help="train/eval numbers only (faster A/B loops)")
    args = p.parse_args()

    import jax
    import numpy as np

    from msa_tpu.configs import build_experiment
    from msa_tpu.data.dataset import MultimodalDataset
    from msa_tpu.data.featurize import synthetic_split
    from msa_tpu.training.trainer import Trainer

    exp = build_experiment(
        dataset="mosi", model_name=args.model, num_labels=1,
        train_batch_size=args.batch_size,
        compute_dtype=args.compute_dtype,
        use_flash_attention=args.flash,
        warmup_proportion=0.01,
    )
    import dataclasses
    exp = dataclasses.replace(
        exp, data=dataclasses.replace(exp.data, max_seq_length=args.max_seq_length),
        train=dataclasses.replace(
            exp.train, adam_mu_dtype=args.adam_mu_dtype,
            adam_nu_dtype=args.adam_nu_dtype,
            **({"remat_policy": args.remat_policy}
               if args.remat_policy else {})))

    trainer = Trainer(exp)
    vdim, sdim = exp.model.visual_dim, exp.model.speech_dim
    split = synthetic_split(args.batch_size * 4, args.max_seq_length, vdim,
                            sdim, vocab_size=exp.model.bert.vocab_size, seed=0)
    ds = MultimodalDataset(split, seed=0)
    batches = list(ds.epoch_batches(0, args.batch_size, drop_last=True))

    state = trainer.init_state(jax.random.key(0), total_steps=10_000)
    step = trainer._build_train_step()
    rng = trainer.rng(1)

    sharded = [trainer._shard_batch(b) for b in batches]
    # NOTE: device_get (not block_until_ready) is the sync point -- on the
    # axon remote platform block_until_ready returns before execution
    # completes, which silently breaks timing.
    for i in range(args.warmup):
        state, metrics = step(state, sharded[i % len(sharded)], rng)
        float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, sharded[i % len(sharded)], rng)
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0

    n_chips = trainer.mesh.devices.size
    samples_per_sec = args.steps * args.batch_size / dt
    per_chip = samples_per_sec / n_chips
    mfu = trainer.mfu(samples_per_sec)

    # eval/serving throughput (deterministic forward, no grad)
    eval_step = trainer._build_eval_step()
    erng = trainer.rng(2)
    losses = eval_step(state.params, sharded[0], erng)
    float(jax.device_get(losses["loss"]))
    t0 = time.perf_counter()
    for i in range(args.steps):
        losses = eval_step(state.params, sharded[i % len(sharded)], erng)
    float(jax.device_get(losses["loss"]))
    eval_sps = args.steps * args.batch_size / (time.perf_counter() - t0)

    # serving throughput via the Predictor API (pipelined dispatch), bf16
    # and the int8 MXU path
    from msa_tpu.inference import Predictor
    serving = {}
    serve_split = synthetic_split(args.batch_size * 8, args.max_seq_length,
                                  vdim, sdim,
                                  vocab_size=exp.model.bert.vocab_size, seed=3)
    for mode in ([] if args.skip_serving else [None, "int8", "int8_static"]):
        pred = Predictor(exp, state.params,
                         batch_size=args.batch_size, quantize=mode,
                         calibration=(serve_split if mode == "int8_static"
                                      else None))
        pred.predict_split(serve_split)  # compile
        t0 = time.perf_counter()
        pred.predict_split(serve_split)
        pred.predict_split(serve_split)
        serve_dt = (time.perf_counter() - t0) / 2
        serving["serving_samples_per_sec" + (f"_{mode}" if mode else "")] = \
            round(len(serve_split) / serve_dt, 1)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "benchmarks", "torch_baseline.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("samples_per_sec"):
            vs_baseline = per_chip / base["samples_per_sec"]

    print(json.dumps({
        "metric": "mmbert_large_trimodal_train_samples_per_sec_per_chip",
        "value": round(per_chip, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "extra": {
            "batch_size": args.batch_size,
            "seq_length": args.max_seq_length,
            "chips": n_chips,
            "step_ms": round(1000 * dt / args.steps, 2),
            "mfu": round(mfu, 4),
            "eval_samples_per_sec": round(eval_sps, 1),
            **serving,
            "loss": float(jax.device_get(metrics["loss"])),
            "compute_dtype": args.compute_dtype,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
