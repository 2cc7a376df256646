"""Dataset / featurizer / pairing semantics."""

import numpy as np
import pytest

from msa_tpu.data import MultimodalDataset, synthetic_split
from msa_tpu.data.dataset import sample_pairing
from msa_tpu.data.featurize import featurize, select_target
from msa_tpu.data.wordpiece import Tokenizer, make_test_vocab


@pytest.fixture(scope="module")
def tok():
    return Tokenizer(make_test_vocab())


def _raw_sample(words, label, dv=5, ds=7):
    n = len(words)
    rng = np.random.default_rng(0)
    return ((np.array(words), rng.standard_normal((n, dv)).astype(np.float32),
             rng.standard_normal((n, ds)).astype(np.float32)),
            np.array([[label]]), "vid[0]")


class TestFeaturize:
    def test_layout(self, tok):
        sample = _raw_sample(["the", "movie", "was", "great"], 1.5)
        sp = featurize([sample], tok, 12, 5, 7, "mosi", "sentiment", 7)
        ids = sp.input_ids[0]
        assert ids[0] == tok.cls_token_id
        assert ids[5] == tok.sep_token_id
        assert sp.attention_mask[0].sum() == 6  # CLS + 4 words + SEP
        # frames occupy [0, 4); rows 4.. are zero (SEP frame + padding)
        assert np.abs(sp.visual[0, :4]).sum() > 0
        assert np.abs(sp.visual[0, 4:]).sum() == 0
        assert sp.target[0] == pytest.approx(1.5)

    def test_wordpiece_inversion_replicates_frames(self, tok):
        # 'actly' splits into act + ##ly with the test vocab
        sample = _raw_sample(["actly", "movie"], 0.5)
        sp = featurize([sample], tok, 12, 5, 7, "mosi", "sentiment", 7)
        # 3 tokens: act, ##ly, movie -> frames 0 and 1 share word 0's features
        assert np.allclose(sp.visual[0, 0], sp.visual[0, 1])
        assert not np.allclose(sp.visual[0, 1], sp.visual[0, 2])

    def test_truncation(self, tok):
        words = ["movie"] * 50
        sp = featurize([_raw_sample(words, 0.0)], tok, 10, 5, 7, "mosi",
                       "sentiment", 7)
        assert sp.attention_mask[0].sum() == 10  # full: CLS + 8 + SEP
        assert sp.input_ids[0, -1] == tok.sep_token_id


class TestSelectTarget:
    def test_mosi(self):
        assert select_target([2.2], "mosi", "sentiment", 7) == pytest.approx(2.2)
        assert select_target([2.2], "mosi", "sentiment", 1) == pytest.approx(2.2 / 3)
        assert select_target([-0.5], "mosi", "sentiment", 2) == 0
        assert select_target([0.0], "mosi", "sentiment", 2) == 1

    def test_mosei_emotion(self):
        raw = [0.0, 0.1, 0.0, 0.9, 0.0, 0.0, 0.0]
        assert select_target(raw, "mosei", "anger", 2) == 1
        assert select_target(raw, "mosei", "sad", 2) == 0
        assert select_target(raw, "mosei", "happy", 6) == 2  # argmax of raw[1:]

    def test_ur_funny(self):
        assert select_target([1], "ur_funny", "humor", 2) == 1
        assert select_target([0], "ur_funny", "humor", 2) == 0


class TestPairing:
    def test_last_index_always_aligned(self):
        for seed in range(5):
            p = sample_pairing(50, np.random.default_rng(seed))
            assert p.visual_ap[-1] == 1 and p.visual_index[-1] == 49
            assert p.speech_ap[-1] == 1 and p.speech_index[-1] == 49

    def test_unaligned_never_self(self):
        p = sample_pairing(200, np.random.default_rng(1))
        neg = p.visual_ap == 0
        assert (p.visual_index[neg] != np.arange(200)[neg]).all()

    def test_aligned_fraction(self):
        p = sample_pairing(5000, np.random.default_rng(2))
        assert 0.45 < p.visual_ap.mean() < 0.55

    def test_force_aligned(self):
        p = sample_pairing(10, np.random.default_rng(0), force_aligned=True)
        assert (p.visual_ap == 1).all()
        assert (p.visual_index == np.arange(10)).all()


class TestBatches:
    def test_fixed_shapes_and_tail_weights(self):
        sp = synthetic_split(10, 16, 5, 7, vocab_size=1000)
        ds = MultimodalDataset(sp, seed=0)
        batches = list(ds.epoch_batches(0, 4))
        assert len(batches) == 3
        for b in batches:
            assert b["text_ids"].shape == (4, 16)
            assert b["visual"].shape == (4, 16, 5)
        assert batches[-1]["weight"].tolist() == [1.0, 1.0, 0.0, 0.0]

    def test_reproducible_by_seed_and_epoch(self):
        sp = synthetic_split(20, 16, 5, 7, vocab_size=1000)
        a = list(MultimodalDataset(sp, seed=1).epoch_batches(3, 4))
        b = list(MultimodalDataset(sp, seed=1).epoch_batches(3, 4))
        c = list(MultimodalDataset(sp, seed=1).epoch_batches(4, 4))
        assert (a[0]["text_ids"] == b[0]["text_ids"]).all()
        assert not all((x["text_ids"] == y["text_ids"]).all() for x, y in zip(a, c))
