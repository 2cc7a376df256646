"""Golden tests: our WordPiece tokenizer vs transformers.BertTokenizer."""

import os
import tempfile

import pytest

from msa_tpu.data.wordpiece import Tokenizer, make_test_vocab

transformers = pytest.importorskip("transformers")

TEXTS = [
    "the movie was great",
    "REALLY?! not good...",
    "acting badly, plot really bad",
    "zebra quixotic",  # forces ##-decomposition / [UNK] paths
    "café naïve",       # accent stripping
    "the   movie\twas\ngreat",
    "a b c d e f g",
    "",
    "!!!",
    "你好 movie",  # CJK chars get isolated
]


@pytest.fixture(scope="module")
def vocab_file():
    vocab = make_test_vocab(extra_words=["zebra", "##bra", "ze", "qui", "##xo", "##tic"])
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for tok in sorted(vocab, key=vocab.get):
            f.write(tok + "\n")
        path = f.name
    yield path
    os.unlink(path)


@pytest.fixture(scope="module")
def ours(vocab_file):
    return Tokenizer.from_file(vocab_file)


@pytest.fixture(scope="module")
def hf(vocab_file):
    return transformers.BertTokenizer(vocab_file, do_lower_case=True)


@pytest.mark.parametrize("text", TEXTS)
def test_tokenize_matches_hf(ours, hf, text):
    assert ours.tokenize(text) == hf.tokenize(text)


@pytest.mark.parametrize("text", TEXTS)
def test_ids_match_hf(ours, hf, text):
    toks = ours.tokenize(text)
    assert ours.convert_tokens_to_ids(toks) == hf.convert_tokens_to_ids(toks)


def test_special_tokens(ours, hf):
    assert ours.pad_token_id == hf.pad_token_id
    assert ours.cls_token_id == hf.cls_token_id
    assert ours.sep_token_id == hf.sep_token_id
    assert ours.mask_token_id == hf.mask_token_id
    assert ours.unk_token_id == hf.unk_token_id
