"""Alpha/beta grid sweep driver (ref run_main.sh:3-8).

The reference shells out to train.py over a 10x10 grid of
alpha, beta in {0.1..1.0}.  Here the sweep runs in-process (one device
mesh, no re-tokenization between cells) and records each cell's best
metrics to a JSON lines file.

    python -m msa_tpu.cli.sweep --dataset mosi --num_labels 7 \
        --data_pkl cmu_mosi.pkl --vocab vocab.txt \
        --alphas 0.1:1.0:10 --betas 0.1:1.0:10
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_grid(spec: str):
    """'0.1:1.0:10' -> 10 evenly spaced values; '0.3,0.5' -> exact list."""
    if ":" in spec:
        lo, hi, n = spec.split(":")
        return [round(float(x), 6) for x in np.linspace(float(lo), float(hi), int(n))]
    return [float(x) for x in spec.split(",")]


def main(argv=None):
    from .train import main as train_main

    p = argparse.ArgumentParser(description=__doc__, add_help=False)
    p.add_argument("--alphas", type=str, default="0.1:1.0:10")
    p.add_argument("--betas", type=str, default="0.1:1.0:10")
    p.add_argument("--out", type=str, default="sweep_results.jsonl")
    sweep_args, rest = p.parse_known_args(argv)

    alphas = parse_grid(sweep_args.alphas)
    betas = parse_grid(sweep_args.betas)
    results = []
    for a in alphas:
        for b in betas:
            cell_argv = rest + ["--alpha", str(a), "--beta", str(b)]
            result = train_main(cell_argv)
            row = {
                "alpha": a, "beta": b,
                "best_epoch": result.best_epoch + 1,
                "best_acc": result.best_acc,
                "best_mae": result.best_mae,
                "best_f1": result.best_f1,
            }
            results.append(row)
            with open(sweep_args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(json.dumps(row))
    best = max(results, key=lambda r: r["best_acc"])
    print("BEST CELL:", json.dumps(best))
    return results


if __name__ == "__main__":
    main()
