"""Streaming inference service: JSONL requests in, predictions out.

The reference has no serving path at all (its only inference is the
crashed bs=1 sampling loop, ref sampling.py:314-330).  This CLI wraps the
batched :class:`msa_tpu.inference.Predictor` (load once, jit once) as a
line protocol suitable for piping or supervising as a worker process:

    python -m msa_tpu.cli.serve --checkpoint model_save/<run> \
        --vocab vocab.txt < requests.jsonl > predictions.jsonl

One JSON object per input line:

    {"id": "any", "words": ["i", "love", "it"],
     "visual": [[...frame...], ...], "speech": [[...frame...], ...]}

``visual``/``speech`` are optional (zero-filled when absent -- text-only
sentiment).  When the checkpoint is word-aligned (``pair_seq_length``
unset), supplied ``visual``/``speech`` must have exactly ONE row per word
(the featurizer replicates rows per sub-token by word index); a length
mismatch yields an error line rather than silently misaligned features.
Frame-level checkpoints (``pair_seq_length`` set) accept native-rate
frames.  Each output line echoes ``id`` and adds ``prediction``.
Lines are micro-batched up to the Predictor's batch size and flushed on a
full batch, on EOF, or after ``--max_wait`` seconds of idle input (so a
single request on a held-open pipe still gets its answer); an invalid
line produces an ``{"id": ..., "error": ...}`` line instead of killing
the service.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="run dir (latest epoch) or direct epoch dir")
    p.add_argument("--model_num", type=int, default=None,
                   help="select a specific retained epoch checkpoint "
                        "(ref sampling.py --model_num)")
    p.add_argument("--vocab", required=True, help="BERT wordpiece vocab.txt")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--quantize", choices=["int8", "int8_static"], default=None,
                   help="int8-quantize the encoder projections (MXU int8 "
                        "path; ~1.2x serving throughput at bert-large). "
                        "'int8_static' uses static activation scales "
                        "calibrated on --calibration (no per-token absmax "
                        "pass in the jit)")
    p.add_argument("--calibration", default=None,
                   help="JSONL requests file (same schema as serving input) "
                        "used to calibrate int8_static activation scales")
    p.add_argument("--max_wait", type=float, default=0.05,
                   help="flush a partial batch once its OLDEST request is "
                        "this many seconds old (piped/streaming mode; the "
                        "per-request latency bound under light load; 0 "
                        "disables the timer and flushes only on full batch "
                        "or EOF).  Default tuned from the round-4 held-pipe "
                        "measurements (BENCH.md): 0.05 dominates 0.2 at "
                        "every arrival rate tried -- p50 ~90 ms at 5-200 "
                        "req/s with no throughput loss (partial flushes "
                        "fill before the timer once batches are full)")
    p.add_argument("--drain_flush", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="flush a partial batch as soon as select proves the "
                        "input fd is drained (no further request is pending) "
                        "instead of waiting out --max_wait: puts light-load "
                        "latency at the compute floor with zero throughput "
                        "cost (under load the fd is never drained; the "
                        "deadline stays as the fallback bound).  "
                        "--no-drain_flush restores pure deadline batching")
    p.add_argument("--input", default=None,
                   help="JSONL file (default: stdin)")
    p.add_argument("--output", default=None,
                   help="JSONL file (default: stdout)")
    p.add_argument("--platform", type=str, default=None)
    return p


def featurize_request(req, tokenizer, L, Lp, vdim, sdim):
    words = [str(w) for w in req["words"]]
    visual = np.asarray(req.get("visual", []), np.float32).reshape(-1, vdim) \
        if req.get("visual") else np.zeros((len(words), vdim), np.float32)
    speech = np.asarray(req.get("speech", []), np.float32).reshape(-1, sdim) \
        if req.get("speech") else np.zeros((len(words), sdim), np.float32)
    if Lp is None:
        # Word-aligned checkpoint: the featurizer indexes features by WORD
        # (one row per word, replicated per sub-token).  Extra rows would
        # silently misalign (fewer already raise), so validate here.
        for name, arr in (("visual", visual), ("speech", speech)):
            if len(arr) != len(words):
                raise ValueError(
                    f"word-aligned model: {name} must have one row per word "
                    f"(got {len(arr)} rows for {len(words)} words); resample "
                    f"frames to word level or serve a frame-level "
                    f"(pair_seq_length) checkpoint")
    from ..data.featurize import featurize
    sample = ((words, visual, speech), [np.array([0.0])], req.get("id"))
    return featurize([sample], tokenizer, L, vdim, sdim, "mosi", "sentiment",
                     1, pair_seq_length=Lp)


# Sentinel yielded by _iter_lines when the input fd is drained right after
# complete lines arrived: the caller may flush its partial batch immediately
# instead of waiting out the --max_wait deadline (light-load latency).
_DRAINED = object()


def _iter_lines(fin, max_wait, timeout_fn=None, drain_flush=False):
    """Yield decoded lines from ``fin``; yield ``None`` when the flush
    timer fires (the caller's cue to flush a partial batch).

    The select timeout comes from ``timeout_fn()`` each iteration (the
    caller points it at the OLDEST pending request's deadline -- a plain
    idle timer would be reset by every new arrival, so at arrival gaps
    close to max_wait a request could wait the full batch-fill time:
    measured p50 756 ms at 5 req/s vs the ~270 ms deadline bound,
    BENCH.md round 4); ``max_wait`` alone is the fallback when no
    timeout_fn is given.

    ``drain_flush=True`` additionally yields :data:`_DRAINED` whenever the
    fd has no more data ready immediately after complete lines were
    consumed: select has PROVEN no further input is pending, so a lone
    request need not wait out the deadline (round-4 measurement: p50 was
    timer-dominated at ~max_wait+compute at every light rate).  The server
    is synchronous -- a flush blocks the read loop -- so "no batch in
    flight" holds by construction whenever the generator runs; under load
    the fd is never drained (arrivals queue during each flush) and
    batching is unaffected.  The deadline stays as the fallback bound.

    Timed mode reads the raw fd via select+os.read so a complete line is
    never stranded inside Python's buffered reader while select blocks on
    the fd.  Seekable files (and max_wait=0) use plain iteration: they are
    always ready, so the timer is meaningless there.
    """
    timed = max_wait and max_wait > 0
    if timed:
        try:
            timed = not fin.seekable()
        except Exception:
            pass
        try:
            fd = fin.fileno()
        except Exception:
            timed = False
    if not timed:
        yield from fin
        return
    import os
    import select
    buf = b""
    check_drain = False
    while True:
        if check_drain:
            # zero-timeout probe right after lines were consumed; only a
            # NEGATIVE probe yields (no busy loop: the next iteration
            # always reaches the blocking select below)
            check_drain = False
            ready, _, _ = select.select([fd], [], [], 0.0)
            if not ready:
                yield _DRAINED
                continue
        else:
            wait = timeout_fn() if timeout_fn is not None else max_wait
            ready, _, _ = select.select([fd], [], [], max(wait, 0.0))
            if not ready:
                yield None
                continue
        chunk = os.read(fd, 1 << 16)
        if not chunk:
            if buf:
                yield buf.decode("utf-8", "replace")
            return
        buf += chunk
        got_line = False
        while b"\n" in buf:
            line, buf = buf.split(b"\n", 1)
            yield line.decode("utf-8", "replace")
            got_line = True
        check_drain = drain_flush and got_line


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ..data.fast_wordpiece import FastTokenizer
    from ..inference import Predictor

    tokenizer = FastTokenizer(args.vocab)
    calibration = None
    if args.quantize == "int8_static":
        if not args.calibration:
            raise SystemExit("--quantize int8_static needs --calibration "
                             "<requests.jsonl>")
        from ..data.featurize import FeaturizedSplit
        from ..training.checkpoint import load_config, resolve_checkpoint
        ccfg = load_config(resolve_checkpoint(args.checkpoint, args.model_num))
        if ccfg is None:
            raise SystemExit(f"no config.json in {args.checkpoint}")
        splits = []
        with open(args.calibration) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                splits.append(featurize_request(
                    json.loads(line), tokenizer, ccfg.data.max_seq_length,
                    ccfg.data.pair_seq_length, ccfg.model.visual_dim,
                    ccfg.model.speech_dim))
        if not splits:
            raise SystemExit(f"empty calibration file {args.calibration}")
        calibration = FeaturizedSplit(
            input_ids=np.concatenate([s.input_ids for s in splits]),
            attention_mask=np.concatenate([s.attention_mask for s in splits]),
            visual=np.concatenate([s.visual for s in splits]),
            speech=np.concatenate([s.speech for s in splits]),
            target=np.concatenate([s.target for s in splits]),
            segments=[], words=[])

    predictor = Predictor.from_checkpoint(args.checkpoint,
                                          batch_size=args.batch_size,
                                          model_num=args.model_num,
                                          quantize=args.quantize,
                                          calibration=calibration)
    cfg = predictor.config
    L = cfg.data.max_seq_length
    Lp = cfg.data.pair_seq_length
    vdim, sdim = cfg.model.visual_dim, cfg.model.speech_dim

    fin = open(args.input) if args.input else sys.stdin
    fout = open(args.output, "w") if args.output else sys.stdout

    import time as _time

    pending: list = []  # (id, FeaturizedSplit)
    # monotonic timestamp of the OLDEST un-flushed request: --max_wait
    # bounds ITS age (deadline flush), not the gap between arrivals
    pending_since = [None]

    def flush():
        if not pending:
            pending_since[0] = None
            return
        ids = np.concatenate([s.input_ids for _, s in pending])
        mask = np.concatenate([s.attention_mask for _, s in pending])
        vis = np.concatenate([s.visual for _, s in pending])
        spc = np.concatenate([s.speech for _, s in pending])
        preds = predictor.predict_arrays(ids, mask, vis, spc)
        for (rid, _), pred in zip(pending, preds):
            fout.write(json.dumps({"id": rid, "prediction": float(pred)}) + "\n")
        fout.flush()
        pending.clear()
        pending_since[0] = None

    def timeout_fn():
        if pending_since[0] is None:
            return args.max_wait
        return pending_since[0] + args.max_wait - _time.monotonic()

    for line in _iter_lines(fin, args.max_wait, timeout_fn,
                            drain_flush=args.drain_flush):
        if line is None or line is _DRAINED:
            # deadline hit, or select proved no further input is pending
            # (and no batch is in flight -- the flush below is synchronous):
            # answer the partial batch now
            flush()
            continue
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            split = featurize_request(req, tokenizer, L, Lp, vdim, sdim)
        except Exception as e:  # bad line must not kill the service
            rid = None
            try:
                rid = json.loads(line).get("id")
            except Exception:
                pass
            fout.write(json.dumps({"id": rid, "error": str(e)}) + "\n")
            fout.flush()
            continue
        if pending_since[0] is None:
            pending_since[0] = _time.monotonic()
        pending.append((req.get("id"), split))
        if len(pending) >= args.batch_size or (
                args.max_wait and args.max_wait > 0
                and _time.monotonic() - pending_since[0] >= args.max_wait):
            flush()
    flush()
    if args.input:
        fin.close()
    if args.output:
        fout.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
