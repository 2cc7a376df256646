"""Amdahl decomposition of the int8_static serving step (round-3 VERDICT
item 4): where does the time go when only the six encoder projections are
int8 -- and what bounds the path short of the 2x int8 MXU peak?

Profiles Predictor._forward (the exact serving jit) with xprof and buckets
per-op device self-time into:

  * int8 projections (quantized matmul fusions: q/k/v/o/wi/wo, incl. the
    fused quantize/requant epilogues XLA rides along),
  * attention kernel (bf16 short_attention custom-call),
  * embeddings/gathers, layernorm/elementwise fusions, heads/pooler/other
    bf16 matmuls, copies/infeed.

Usage: python benchmarks/profile_serve_int8.py [--quantize int8_static]
       [--batch_size 96] [--reps 8]
"""

import argparse
import json
import sys
import tempfile

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=96)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--quantize", default="int8_static",
                   choices=["none", "int8", "int8_static"])
    p.add_argument("--fuse_qkv", action="store_true",
                   help="A/B the measured-losing fused q|k|v int8 variant "
                        "(BENCH.md round 4)")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    from msa_tpu.configs import build_experiment
    from msa_tpu.data.featurize import synthetic_split
    from msa_tpu.inference import Predictor
    from msa_tpu.models.mmbert import init_mmbert_params

    exp = build_experiment(dataset="mosi", model_name="bert-large-uncased",
                           num_labels=1, train_batch_size=args.batch_size,
                           compute_dtype="bfloat16")
    params = init_mmbert_params(jax.random.key(0), exp.model)
    split = synthetic_split(args.batch_size, 40, exp.model.visual_dim,
                            exp.model.speech_dim,
                            vocab_size=exp.model.bert.vocab_size, seed=3)
    quant = None if args.quantize == "none" else args.quantize
    pred = Predictor(exp, params, batch_size=args.batch_size, quantize=quant,
                     calibration=(split if quant == "int8_static" else None),
                     fuse_qkv=args.fuse_qkv)

    ids = jax.device_put(split.input_ids, pred._batch_sharding)
    mask = jax.device_put(split.attention_mask, pred._batch_sharding)
    vis = jax.device_put(split.visual, pred._batch_sharding)
    spc = jax.device_put(split.speech, pred._batch_sharding)
    out = pred._forward(pred.params, ids, mask, vis, spc)
    np.asarray(jax.device_get(out))  # compile + sync

    import time
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = pred._forward(pred.params, ids, mask, vis, spc)
    np.asarray(jax.device_get(out))
    wall = (time.perf_counter() - t0) / args.reps
    print(f"wall: {wall*1e3:.2f} ms/batch = "
          f"{args.batch_size/wall:.1f} samples/s ({args.quantize})")

    trace_dir = tempfile.mkdtemp(prefix=f"xprof_serve_{args.quantize}_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.reps):
            out = pred._forward(pred.params, ids, mask, vis, spc)
        np.asarray(jax.device_get(out))

    sys.path.insert(0, "/root/repo/benchmarks")
    from profile_step import collect_op_profile
    tables = json.loads(collect_op_profile(trace_dir))
    tbl = tables[0] if isinstance(tables, list) else tables
    ids_ = [c["id"] for c in tbl["cols"]]
    rows = []
    total = 0.0
    for row in tbl["rows"]:
        r = {i: (c or {}).get("v") for i, c in zip(ids_, row["c"])}
        if r.get("host_or_device") != "Device":
            continue
        st = float(r.get("total_self_time") or 0)
        total += st
        rows.append((st, str(r.get("type", "?")),
                     str(r.get("operation", "?"))))

    def bucket(typ, op):
        o = op.lower()
        if "int8" in o or "s8" in o or "convert" in o and "s8" in o:
            return "int8_projections"
        if "custom-call" in typ.lower() or "short_attention" in o \
                or "pallas" in o:
            return "attention_kernel"
        if "dot" in o or "dot" in typ.lower() or "conv" in o:
            # NOTE: op names carry no dtype; under --quantize these encoder
            # dots ARE the int8 projections (arithmetic check, BENCH.md:
            # 11.6 TFLOP of projections in 44.5 ms = 261 TOP/s, impossible
            # in bf16).  The label is the op class, not the precision.
            return "proj_dots"
        if "gather" in o or "embed" in o or "take" in o:
            return "embeddings"
        if "fusion" in typ.lower():
            return "elementwise_fusions"
        if "copy" in o or "transpose" in o or "infeed" in o:
            return "copies"
        return "other"

    buckets = {}
    for st, typ, op in rows:
        buckets.setdefault(bucket(typ, op), [0.0, 0])
        buckets[bucket(typ, op)][0] += st
        buckets[bucket(typ, op)][1] += 1

    print(f"\ndevice total {total/args.reps/1e3:.2f} ms/batch; buckets:")
    for k, (st, n) in sorted(buckets.items(), key=lambda x: -x[1][0]):
        print(f"  {k:22s} {st/args.reps/1e3:8.3f} ms  "
              f"({100*st/total:5.1f}%)  [{n} ops]")

    rows.sort(reverse=True)
    print(f"\ntop {args.top} ops (ms/batch, % of device):")
    for st, typ, op in rows[: args.top]:
        print(f"{st/args.reps/1e3:9.3f}  {100*st/total:5.1f}  [{typ}] "
              f"{op[:120]}")


if __name__ == "__main__":
    main()
