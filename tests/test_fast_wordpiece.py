"""Native C++ WordPiece encoder: exact parity with the Python tokenizer."""

import os
import tempfile

import numpy as np
import pytest

from msa_tpu.data.fast_wordpiece import FastTokenizer
from msa_tpu.data.wordpiece import Tokenizer, make_test_vocab


@pytest.fixture(scope="module")
def vocab_file():
    vocab = make_test_vocab(extra_words=["zebra", "qui", "##xo", "##tic",
                                         "##ly", "playing", "play"])
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for tok in sorted(vocab, key=vocab.get):
            f.write(tok + "\n")
        path = f.name
    yield path
    os.unlink(path)


@pytest.fixture(scope="module")
def fast(vocab_file):
    tok = FastTokenizer(vocab_file)
    if not tok.native_available:
        pytest.skip("native library unavailable (no g++?)")
    return tok


WORD_LISTS = [
    ["the", "movie", "was", "great"],
    ["REALLY", "Bad", "ACTing"],
    ["playing", "badly", "plot!"],
    ["zebra", "quixotic", "zzz"],        # multi-piece + UNK paths
    ["a", "", "b"],                       # empty word: no tokens, index skipped
    ["don't", "stop...", "now?!"],
    ["x" * 150],                          # too-long word -> UNK
]


@pytest.mark.parametrize("words", WORD_LISTS)
def test_native_matches_python(fast, words):
    ids_f, inv_f = fast.encode_words(words)
    ids_p, inv_p = fast._encode_words_python(words)
    np.testing.assert_array_equal(ids_f, ids_p)
    np.testing.assert_array_equal(inv_f, inv_p)


@pytest.mark.parametrize("words", [
    ["bad\nmovie", "plot"],    # embedded '\n' = the native protocol separator
    ["bad\rmovie", "plot"],    # '\r': Python splits it, the C side does not
    ["a", "b\n", "c"],
])
def test_control_chars_fall_back(fast, words):
    """Words containing the protocol separator must not shift inversion
    indices (they previously desynced the visual/speech frame gather)."""
    ids_f, inv_f = fast.encode_words(words)
    ids_p, inv_p = fast._encode_words_python(words)
    np.testing.assert_array_equal(ids_f, ids_p)
    np.testing.assert_array_equal(inv_f, inv_p)
    assert inv_f.size == 0 or inv_f.max() < len(words)


def test_non_ascii_falls_back(fast):
    words = ["café", "movie"]
    ids_f, inv_f = fast.encode_words(words)
    ids_p, inv_p = fast._encode_words_python(words)
    np.testing.assert_array_equal(ids_f, ids_p)
    np.testing.assert_array_equal(inv_f, inv_p)


def test_featurize_same_output_fast_vs_python(fast, vocab_file):
    from msa_tpu.data.featurize import featurize
    rng = np.random.default_rng(0)
    samples = []
    for words in WORD_LISTS[:4]:
        n = len(words)
        samples.append(((np.array(words),
                         rng.standard_normal((n, 5)).astype(np.float32),
                         rng.standard_normal((n, 7)).astype(np.float32)),
                        np.array([[1.0]]), "vid[0]"))
    slow = Tokenizer.from_file(vocab_file)
    a = featurize(samples, fast, 16, 5, 7, "mosi", "sentiment", 7)
    b = featurize(samples, slow, 16, 5, 7, "mosi", "sentiment", 7)
    np.testing.assert_array_equal(a.input_ids, b.input_ids)
    np.testing.assert_array_equal(a.attention_mask, b.attention_mask)
    np.testing.assert_array_equal(a.visual, b.visual)
