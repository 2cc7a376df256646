"""Serving LATENCY under a held-open pipe (round-3 VERDICT item 5).

bench.py reports serving THROUGHPUT only; this harness measures what a
caller actually waits: per-request p50/p99 from write-to-stdin to the
prediction line on stdout, against a real ``msa_tpu.cli.serve`` subprocess
(the production entry: batching, --max_wait idle flush, Predictor dispatch
window all included).

Scenarios per quantize mode:
  * cold: ONE request into a freshly-warmed server (the batching timer is
    the floor: the request waits --max_wait before a partial-batch flush);
  * arrival rates (uniform spacing): low (timer-bound), ~batch_size/max_wait
    (crossover), and high (full batches, compute-bound).

Builds a throwaway bert-large checkpoint (random weights -- latency does
not depend on weight values) + test vocab under --workdir on first use.

    python benchmarks/bench_serve_latency.py [--quantize int8_static] \
        [--rates 5,50,200] [--n 160]
"""

import argparse
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORDS = ["the", "movie", "was", "really", "great", "bad", "not", "good",
         "plot", "act", "film", "fine"]


def ensure_checkpoint(workdir: str) -> tuple:
    """Create (once) a random bert-large checkpoint + vocab for serving."""
    ckpt = os.path.join(workdir, "ckpt")
    vocab = os.path.join(workdir, "vocab.txt")
    marker = os.path.join(ckpt, "state.msgpack")
    if os.path.exists(marker) and os.path.exists(vocab):
        return ckpt, vocab
    os.makedirs(ckpt, exist_ok=True)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from msa_tpu.data.wordpiece import make_test_vocab
    tv = make_test_vocab()
    inv = {v: k for k, v in tv.items()}
    with open(vocab, "w") as f:
        for i in range(30522):
            f.write(inv.get(i, f"[unused{i}]") + "\n")

    import jax
    import jax.numpy as jnp
    from msa_tpu.configs import build_experiment
    from msa_tpu.models.mmbert import init_mmbert_params
    from msa_tpu.training.checkpoint import save_checkpoint
    from msa_tpu.training.optim import make_optimizer
    from msa_tpu.training.train_state import TrainState

    exp = build_experiment(dataset="mosi", model_name="bert-large-uncased",
                           num_labels=1)
    params = init_mmbert_params(jax.random.key(0), exp.model)
    tx = make_optimizer(exp.train, 1)
    state = TrainState(params=params, opt_state=jax.jit(tx.init)(params),
                       step=jnp.zeros((), jnp.int32))
    save_checkpoint(ckpt, state, exp, epoch=0)
    return ckpt, vocab


def make_request(rid: int, rng) -> str:
    k = int(rng.integers(5, 12))
    words = [str(w) for w in rng.choice(WORDS, size=k)]
    visual = rng.standard_normal((k, 47)).round(3).tolist()
    speech = rng.standard_normal((k, 74)).round(3).tolist()
    return json.dumps({"id": rid, "words": words, "visual": visual,
                       "speech": speech})


class ResponseReader:
    """ONE reader thread per server process, shared by every scenario.

    A per-scenario reader used to race any still-running predecessor for
    stdout lines: when the warmup's 60 s wait expired during the server's
    first compile, the stale thread kept consuming (and, with overlapping
    per-scenario ids, matching) later scenarios' responses — observed as
    n=12 of 40 recorded latencies at rate 5.  Routing everything through
    one thread keyed by globally unique ids removes the race; scenarios
    take an id range from ``next_id``.
    """

    def __init__(self, proc):
        self.proc = proc
        self.recv_t = {}
        self.event = threading.Event()  # set on every prediction line
        self.next_id = 0
        threading.Thread(target=self._run, daemon=True).start()

    def _run(self):
        for line in self.proc.stdout:
            try:
                obj = json.loads(line)
            except Exception:
                continue
            if "prediction" in obj and obj.get("id") is not None:
                self.recv_t[obj["id"]] = time.perf_counter()
                self.event.set()
            elif "error" in obj:
                print("server error line:", line.strip(), file=sys.stderr)

    def wait_for(self, ids, deadline_s):
        end = time.monotonic() + deadline_s
        while time.monotonic() < end:
            if all(i in self.recv_t for i in ids):
                return True
            self.event.clear()
            # re-check after clear to close the set-before-clear window
            if all(i in self.recv_t for i in ids):
                return True
            self.event.wait(timeout=min(1.0, end - time.monotonic()))
        return all(i in self.recv_t for i in ids)


def run_scenario(proc, reader: ResponseReader, n: int, rate: float, rng,
                 deadline_s: float = None) -> dict:
    """Send n requests at ``rate``/s (uniform spacing; rate=0 -> one shot),
    return latency stats."""
    base = reader.next_id
    reader.next_id += n
    ids = range(base, base + n)
    send_t = {}
    gap = 1.0 / rate if rate > 0 else 0.0
    t0 = time.perf_counter()
    for i in ids:
        if gap:
            target = t0 + (i - base) * gap
            now = time.perf_counter()
            if target > now:
                time.sleep(target - now)
        line = make_request(i, rng)
        send_t[i] = time.perf_counter()
        proc.stdin.write(line + "\n")
        proc.stdin.flush()
    reader.wait_for(ids, deadline_s or max(60.0, n * (gap + 0.5)))
    recv_t = reader.recv_t
    lat = np.array([recv_t[i] - send_t[i] for i in ids if i in recv_t])
    if len(lat) == 0:
        return {"n": 0}
    return {
        "n": int(len(lat)),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "p90_ms": round(float(np.percentile(lat, 90)) * 1e3, 1),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 1),
        "mean_ms": round(float(lat.mean()) * 1e3, 1),
        "throughput_rps": round(
            len(lat) / (max(recv_t[i] for i in ids if i in recv_t) - t0), 1),
    }


def main():
    # The driver must NOT hold the TPU -- only the serve subprocess may (one
    # TPU client at a time on this host).  Checkpoint creation runs on CPU.
    import jax
    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/msa_serve_latency")
    p.add_argument("--quantize", default=None,
                   choices=[None, "int8", "int8_static"])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_wait", type=float, default=0.2)
    p.add_argument("--rates", default="5,40,200")
    p.add_argument("--n", type=int, default=160)
    p.add_argument("--no_drain", action="store_true",
                   help="A/B: disable the serve CLI's drain flush (pure "
                        "deadline batching, the pre-round-5 behavior)")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    ckpt, vocab = ensure_checkpoint(args.workdir)

    cmd = [sys.executable, "-m", "msa_tpu.cli.serve",
           "--checkpoint", ckpt, "--vocab", vocab,
           "--batch_size", str(args.batch_size),
           "--max_wait", str(args.max_wait)]
    if args.no_drain:
        cmd += ["--no-drain_flush"]
    results_drain = not args.no_drain
    if args.quantize:
        cmd += ["--quantize", args.quantize]
        if args.quantize == "int8_static":
            calib = os.path.join(args.workdir, "calib.jsonl")
            rng = np.random.default_rng(7)
            with open(calib, "w") as f:
                for i in range(16):
                    f.write(make_request(i, rng) + "\n")
            cmd += ["--calibration", calib]

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True, env=env)
    rng = np.random.default_rng(0)
    results = {"quantize": args.quantize or "bf16",
               "batch_size": args.batch_size, "max_wait": args.max_wait,
               "drain_flush": results_drain}
    reader = ResponseReader(proc)
    try:
        # warmup: exercise both the full-batch and the partial-flush compile
        # paths before timing anything.  The first batch carries the jit
        # compile (minutes on a cold server) -- wait it out, or every later
        # scenario is skewed/starved.
        warm = run_scenario(proc, reader, args.batch_size * 2, 0.0, rng,
                            deadline_s=900.0)
        print("warmup:", warm, file=sys.stderr)
        if warm.get("n") != args.batch_size * 2:
            print("FATAL: warmup incomplete -- server still compiling or "
                  "dead; aborting capture", file=sys.stderr)
            sys.exit(2)
        time.sleep(args.max_wait * 2)
        results["cold_single"] = run_scenario(proc, reader, 1, 0.0, rng)
        for rate in [float(r) for r in args.rates.split(",")]:
            time.sleep(args.max_wait * 2)
            n = args.n if rate >= 10 else max(16, int(rate * 8))
            results[f"rate_{rate:g}rps"] = run_scenario(proc, reader, n,
                                                        rate, rng)
            print(f"rate {rate:g}/s:", results[f"rate_{rate:g}rps"],
                  file=sys.stderr)
    finally:
        proc.stdin.close()
        proc.wait(timeout=60)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
