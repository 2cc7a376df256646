"""Profile the flagship train step on the real TPU and print the per-op
device-time breakdown (top fusions/custom-calls by self time).

Uses jax.profiler.trace + xprof's raw_to_tool_data converter (the only
reliable per-op timing on the axon remote platform -- host wall clocks time
the tunnel, not the chip).

Usage: python benchmarks/profile_step.py [--batch_size 64] [--steps 6]
       [--set key=value ...]   # TrainConfig overrides, e.g. remat_policy
"""

import argparse
import dataclasses
import glob
import json
import os
import tempfile

import jax


def collect_op_profile(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", {})
    return data


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--set", action="append", default=[],
                   help="TrainConfig field override key=value")
    args = p.parse_args()

    from msa_tpu.configs import build_experiment
    from msa_tpu.data.dataset import MultimodalDataset
    from msa_tpu.data.featurize import synthetic_split
    from msa_tpu.training.trainer import Trainer

    exp = build_experiment(dataset="mosi", model_name="bert-large-uncased",
                           num_labels=1, train_batch_size=args.batch_size,
                           compute_dtype="bfloat16", warmup_proportion=0.01)
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        cur = getattr(exp.train, k)
        overrides[k] = type(cur)(v) if not isinstance(cur, bool) else v in ("1", "true", "True")
    overrides.setdefault("adam_mu_dtype", "bfloat16")
    exp = dataclasses.replace(exp, train=dataclasses.replace(exp.train, **overrides))

    trainer = Trainer(exp)
    vdim, sdim = exp.model.visual_dim, exp.model.speech_dim
    split = synthetic_split(args.batch_size, 40, vdim, sdim,
                            vocab_size=exp.model.bert.vocab_size, seed=0)
    ds = MultimodalDataset(split, seed=0)
    batch = trainer._shard_batch(next(ds.epoch_batches(0, args.batch_size,
                                                       drop_last=True)))
    state = trainer.init_state(jax.random.key(0), total_steps=10_000)
    step = trainer._build_train_step()
    rng = trainer.rng(1)

    for _ in range(3):  # warmup incl. donation-relayout recompile
        state, m = step(state, batch, rng)
    float(jax.device_get(m["loss"]))

    trace_dir = tempfile.mkdtemp(prefix="xprof_step_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            state, m = step(state, batch, rng)
        float(jax.device_get(m["loss"]))

    data = collect_op_profile(trace_dir)
    # gviz table list: [{"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}]
    tables = json.loads(data)
    tbl = tables[0] if isinstance(tables, list) else tables
    ids = [c["id"] for c in tbl["cols"]]
    total_us = 0.0
    table = []
    for row in tbl["rows"]:
        r = {i: (c or {}).get("v") for i, c in zip(ids, row["c"])}
        if r.get("host_or_device") != "Device":
            continue
        st = float(r.get("total_self_time") or 0)
        total_us += st
        table.append((st, r.get("type", "?"),
                      str(r.get("operation", "?"))[:110]))
    table.sort(reverse=True)
    per_step = total_us / args.steps / 1000.0
    print(f"\ndevice total: {total_us/1000.0:.1f} ms over {args.steps} steps "
          f"= {per_step:.1f} ms/step")
    print(f"{'ms/step':>9}  {'%':>5}  op")
    for st, typ, op in table[: args.top]:
        print(f"{st/args.steps/1000.0:9.3f}  {100*st/total_us:5.1f}  [{typ}] {op}")


if __name__ == "__main__":
    main()
