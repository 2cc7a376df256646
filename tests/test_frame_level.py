"""Frame-level (unaligned long-stream) mode: pair length Lp != text length L.

Beyond-reference capability (the reference can only consume mmsdk-collapsed
word-aligned features); this is the long-stream seam SURVEY.md section 5.7
reserves for the blockwise kernels.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tpu.configs import MMBertConfig, build_experiment, tiny_bert_config
from msa_tpu.data.dataset import MultimodalDataset
from msa_tpu.data.featurize import featurize, synthetic_split
from msa_tpu.models.mmbert import init_mmbert_params, mmbert_forward, mmbert_loss
from msa_tpu.ops import masking

L, LP, DV, DS = 12, 24, 5, 7


def _cfg():
    return MMBertConfig(bert=tiny_bert_config(), visual_dim=DV, speech_dim=DS)


def _batch(n=6, seed=0):
    split = synthetic_split(n, L, DV, DS, vocab_size=_cfg().bert.vocab_size,
                            seed=seed, pair_seq_length=LP)
    ds = MultimodalDataset(split, seed=seed)
    return next(ds.epoch_batches(0, n))


def test_synthetic_split_shapes():
    split = synthetic_split(4, L, DV, DS, vocab_size=999, pair_seq_length=LP)
    assert split.input_ids.shape == (4, L)
    assert split.visual.shape == (4, LP, DV)
    assert split.speech.shape == (4, LP, DS)


def test_featurize_frame_level_keeps_native_rate():
    """Frame-level mode pads/truncates RAW frames (no inversion replication)."""
    class FakeTok:
        cls_token_id, sep_token_id = 2, 3

        def tokenize(self, w):
            return [w, w + "##x"]  # 2 pieces per word -> inversion would dup

        def convert_tokens_to_ids(self, toks):
            return [5 + i for i in range(len(toks))]

    words = ["a", "b", "c"]
    visual = np.arange(4 * DV, dtype=np.float32).reshape(4, DV)  # 4 frames
    speech = np.ones((4, DS), np.float32)
    samples = [((words, visual, speech), [np.array([1.5])], "seg0")]
    fs = featurize(samples, FakeTok(), L, DV, DS, "mosi", "sentiment", 1,
                   pair_seq_length=LP)
    # raw frames, not inversion-replicated, zero-padded to LP
    np.testing.assert_array_equal(fs.visual[0, :4], visual)
    assert (fs.visual[0, 4:] == 0).all()
    assert fs.visual.shape == (1, LP, DV)
    # word-aligned mode replicates per sub-token instead
    fs_aligned = featurize(samples, FakeTok(), L, DV, DS, "mosi",
                           "sentiment", 1)
    np.testing.assert_array_equal(fs_aligned.visual[0, 0], visual[0])
    np.testing.assert_array_equal(fs_aligned.visual[0, 1], visual[0])


def test_forward_and_loss_with_unequal_pair_length():
    cfg = _cfg()
    b = _batch()
    params = init_mmbert_params(jax.random.key(0), cfg)
    ids = jnp.asarray(b["text_ids"])
    k = jax.random.key(1)
    kt, kv, ks = jax.random.split(k, 3)
    t_ids, t_lab = masking.mask_tokens(kt, ids, 0.15, 4, (0, 2, 3, 4))
    tv_ids, tv_lab = masking.mask_tokens(kv, ids, 0.15, 4, (0, 2, 3, 4))
    ts_ids, ts_lab = masking.mask_tokens(ks, ids, 0.15, 4, (0, 2, 3, 4))

    def run(fuse):
        out = mmbert_forward(params, t_ids, jnp.asarray(b["text_mask"]),
                             tv_ids, ts_ids, jnp.asarray(b["visual"]),
                             jnp.asarray(b["speech"]), cfg,
                             deterministic=True, mlm_scores=False,
                             fuse_text_pass=fuse)
        assert out["seq_joint"].shape[1] == L + LP
        losses = mmbert_loss(params, out, t_lab, tv_lab, ts_lab,
                             jnp.asarray(b["visual_ap"]),
                             jnp.asarray(b["speech_ap"]),
                             jnp.asarray(b["target"]), cfg,
                             weights=jnp.asarray(b["weight"]))
        return losses

    l0 = run(fuse=False)
    l1 = run(fuse=True)
    assert np.isfinite(float(l0["loss"]))
    # the fused [3B, L+LP] pass is numerically the same computation
    np.testing.assert_allclose(float(l0["loss"]), float(l1["loss"]),
                               atol=1e-5)

    g = jax.grad(lambda p: mmbert_loss(
        p, mmbert_forward(p, t_ids, jnp.asarray(b["text_mask"]), tv_ids,
                          ts_ids, jnp.asarray(b["visual"]),
                          jnp.asarray(b["speech"]), cfg, deterministic=True,
                          mlm_scores=False),
        t_lab, tv_lab, ts_lab, jnp.asarray(b["visual_ap"]),
        jnp.asarray(b["speech_ap"]), jnp.asarray(b["target"]), cfg,
        weights=jnp.asarray(b["weight"]))["loss"])(params)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))


def test_fused_joint_embed_unequal_lengths():
    from msa_tpu.ops.fused_joint_embed import _ref_forward, fused_joint_embed
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.standard_normal((2, L, 32)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, LP, DV)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((DV, 32)), jnp.float32)
    bb = jnp.zeros((32,), jnp.float32)
    scale = jnp.ones((32,), jnp.float32)
    bias = jnp.zeros((32,), jnp.float32)
    out = fused_joint_embed(text, feats, w, bb, scale, bias, 1e-12, True)
    ref = _ref_forward(text, feats, w, bb, scale, bias, 1e-12)
    assert out.shape == (2, L + LP, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_trainer_epoch_frame_level():
    exp = build_experiment(dataset="mosi", model_name="tiny", num_labels=1,
                           train_batch_size=4, compute_dtype="float32",
                           warmup_proportion=0.1)
    exp = dataclasses.replace(
        exp,
        data=dataclasses.replace(exp.data, max_seq_length=L,
                                 pair_seq_length=LP),
        train=dataclasses.replace(exp.train, data_parallel=1, n_epochs=1))
    from msa_tpu.training.trainer import Trainer
    tr = Trainer(exp)
    split = synthetic_split(8, L, exp.model.visual_dim, exp.model.speech_dim,
                            vocab_size=exp.model.bert.vocab_size, seed=0,
                            pair_seq_length=LP)
    ds = MultimodalDataset(split, seed=0)
    state = tr.init_state(jax.random.key(0), total_steps=10)
    state, em = tr.train_epoch(state, ds, 0, tr.rng(1))
    m = em.averaged()
    assert np.isfinite(m["loss"])
    assert m["mlm_overflow"] == 0
    # eval path too
    em2, preds, labels = tr.eval_epoch(state, ds, 0, tr.rng(2), 4)
    assert np.isfinite(em2.averaged()["loss"])
    assert len(preds) == len(labels) == 8
