"""Host data-plane benchmark: featurization throughput (native vs Python).

The reference featurizes every sample in a pure-Python loop at startup
(SURVEY.md section 3.1 HOST HOT LOOP #1).  This measures samples/sec for
msa_tpu's Python tokenizer vs the C++ WordPiece fast path.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

from msa_tpu.data.fast_wordpiece import FastTokenizer
from msa_tpu.data.featurize import featurize
from msa_tpu.data.wordpiece import Tokenizer, make_test_vocab


def make_samples(n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    pool = ["the", "movie", "was", "really", "great", "bad", "not", "good",
            "plot", "act", "film", "playing", "badly", "amazing", "story"]
    out = []
    for i in range(n):
        k = int(rng.integers(8, 30))
        words = np.array(rng.choice(pool, size=k))
        out.append(((words,
                     rng.standard_normal((k, 47)).astype(np.float32),
                     rng.standard_normal((k, 74)).astype(np.float32)),
                    np.array([[float(rng.uniform(-3, 3))]]), f"v{i}[{i}]"))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2000)
    args = p.parse_args()

    vocab = make_test_vocab(extra_words=["amazing", "story", "playing"])
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for tok in sorted(vocab, key=vocab.get):
            f.write(tok + "\n")
        vocab_path = f.name

    samples = make_samples(args.n)
    results = {}
    for name, tok in (("python", Tokenizer.from_file(vocab_path)),
                      ("native", FastTokenizer(vocab_path))):
        t0 = time.perf_counter()
        featurize(samples, tok, 40, 47, 74, "mosi", "sentiment", 1)
        dt = time.perf_counter() - t0
        results[name] = round(args.n / dt, 1)
    os.unlink(vocab_path)
    results["speedup"] = round(results["native"] / results["python"], 2)
    print(json.dumps({"metric": "featurize_samples_per_sec", **results}))


if __name__ == "__main__":
    main()
