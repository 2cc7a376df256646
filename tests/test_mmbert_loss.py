"""MMBert loss semantics: dense vs gathered MLM CE, loss assembly identity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tpu.configs import MMBertConfig, tiny_bert_config
from msa_tpu.models.mmbert import (
    gathered_mlm_ce, init_mmbert_params, mlm_logits, mmbert_forward,
    mmbert_loss,
)
from msa_tpu.ops import losses as L
from msa_tpu.ops.masking import mask_tokens


CFG = MMBertConfig(bert=tiny_bert_config(vocab_size=120), visual_dim=5,
                   speech_dim=7, num_labels=1, alpha=0.4, beta=0.7)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    b, s = 4, 12
    params = init_mmbert_params(jax.random.key(0), CFG)
    ids = jnp.asarray(rng.integers(10, 120, (b, s)), jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    visual = jnp.asarray(rng.standard_normal((b, s, 5)), jnp.float32)
    speech = jnp.asarray(rng.standard_normal((b, s, 7)), jnp.float32)
    m_ids, labels = mask_tokens(jax.random.key(1), ids, 0.3,
                                mask_token_id=4, special_ids=(0, 2, 3, 4))
    return params, ids, m_ids, labels, mask, visual, speech


def test_gathered_equals_dense(setup):
    params, ids, m_ids, labels, mask, visual, speech = setup
    out = mmbert_forward(params, m_ids, mask, m_ids, m_ids, visual, speech,
                         CFG, mlm_scores=True)
    dense = float(L.cross_entropy(out["mlm_text"], labels))
    gathered = float(gathered_mlm_ce(params, out["seq_text"], labels, None,
                                     CFG, cap=48))
    assert gathered == pytest.approx(dense, rel=1e-5)


def test_gathered_equals_dense_with_weights(setup):
    params, ids, m_ids, labels, mask, visual, speech = setup
    out = mmbert_forward(params, m_ids, mask, m_ids, m_ids, visual, speech,
                         CFG, mlm_scores=True)
    w = jnp.array([1.0, 1.0, 0.0, 1.0])
    dense = float(L.cross_entropy(out["mlm_text"], labels, w))
    gathered = float(gathered_mlm_ce(params, out["seq_text"], labels, w,
                                     CFG, cap=48))
    assert gathered == pytest.approx(dense, rel=1e-5)


def test_loss_paths_agree(setup):
    """Fused (mlm_scores=False) and dense loss paths give the same totals."""
    params, ids, m_ids, labels, mask, visual, speech = setup
    ap = jnp.array([1, 0, 1, 1])
    target = jnp.array([0.5, -0.2, 0.1, 0.9])
    args = (labels, labels, labels, ap, ap, target, CFG)
    out_dense = mmbert_forward(params, m_ids, mask, m_ids, m_ids, visual,
                               speech, CFG, mlm_scores=True)
    out_fused = mmbert_forward(params, m_ids, mask, m_ids, m_ids, visual,
                               speech, CFG, mlm_scores=False)
    l_dense = mmbert_loss(params, out_dense, *args)
    l_fused = mmbert_loss(params, out_fused, *args)
    for k in ("loss", "mlm_loss", "ap_loss", "label_loss", "nce"):
        assert float(l_fused[k]) == pytest.approx(float(l_dense[k]), rel=1e-4), k
    # gather cap must not drop positions at normal masking rates
    assert int(l_fused["mlm_overflow"]) == 0


def test_compute_mlm_false_matches_all_ignore_labels(setup):
    """compute_mlm=False (the deterministic-eval fast path) equals running
    the CE on all -100 labels -- both give mlm components exactly 0 and the
    same joint loss."""
    params, ids, m_ids, labels, mask, visual, speech = setup
    ap = jnp.array([1, 0, 1, 1])
    target = jnp.array([0.5, -0.2, 0.1, 0.9])
    ignore = jnp.full_like(labels, L.IGNORE_INDEX)
    out = mmbert_forward(params, ids, mask, ids, ids, visual, speech, CFG,
                         mlm_scores=False)
    full = mmbert_loss(params, out, ignore, ignore, ignore, ap, ap, target,
                       CFG)
    fast = mmbert_loss(params, out, ignore, ignore, ignore, ap, ap, target,
                       CFG, compute_mlm=False)
    assert float(full["mlm_loss"]) == 0.0
    assert float(fast["mlm_loss"]) == 0.0
    assert float(fast["loss"]) == pytest.approx(float(full["loss"]), rel=1e-6)
    assert int(fast["mlm_overflow"]) == 0


def test_joint_loss_assembly(setup):
    """joint = alpha*mlm + ap + label - beta*nce (ref line 443)."""
    params, ids, m_ids, labels, mask, visual, speech = setup
    ap = jnp.array([1, 0, 1, 1])
    target = jnp.array([0.5, -0.2, 0.1, 0.9])
    out = mmbert_forward(params, m_ids, mask, m_ids, m_ids, visual, speech,
                         CFG, mlm_scores=True)
    l = mmbert_loss(params, out, labels, labels, labels, ap, ap, target, CFG)
    expected = (CFG.alpha * float(l["mlm_loss"]) + float(l["ap_loss"])
                + float(l["label_loss"]) - CFG.beta * float(l["nce"]))
    # abs tolerance: the joint loss is a small difference of ~O(5) f32 terms
    assert float(l["loss"]) == pytest.approx(expected, abs=1e-5)


def test_remat_forward_matches(setup):
    params, ids, m_ids, labels, mask, visual, speech = setup
    a = mmbert_forward(params, m_ids, mask, m_ids, m_ids, visual, speech,
                       CFG, remat=False, mlm_scores=False)
    b = mmbert_forward(params, m_ids, mask, m_ids, m_ids, visual, speech,
                       CFG, remat=True, mlm_scores=False)
    np.testing.assert_allclose(np.asarray(a["logits"]), np.asarray(b["logits"]),
                               atol=1e-6)


def test_fuse_text_pass_matches_separate(setup):
    """One [3B, 2L] encoder call == [B, L] + [2B, 2L] (padding masked)."""
    params, ids, m_ids, labels, mask, visual, speech = setup
    # exercise real padding: knock out the tail of some sequences
    mask = mask.at[1, 8:].set(0)
    mask = mask.at[3, 5:].set(0)
    a = mmbert_forward(params, m_ids, mask, m_ids, m_ids, visual, speech,
                       CFG, mlm_scores=False, fuse_text_pass=False)
    b = mmbert_forward(params, m_ids, mask, m_ids, m_ids, visual, speech,
                       CFG, mlm_scores=False, fuse_text_pass=True)
    np.testing.assert_allclose(np.asarray(a["logits"]), np.asarray(b["logits"]),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(a["pooled_text"]),
                               np.asarray(b["pooled_text"]), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(a["align_visual"]),
                               np.asarray(b["align_visual"]), atol=2e-5, rtol=2e-5)
    # real (non-padding) positions of the text sequence output match
    m = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(a["seq_text"])[m],
                               np.asarray(b["seq_text"])[m], atol=2e-5, rtol=2e-5)


def test_pair_frame_mask_semantics():
    from msa_tpu.models.mmbert import pair_frame_mask
    f = np.zeros((2, 4, 3), np.float32)
    f[0, 0, 1] = 0.5   # real frame with first coord zero (robustness case)
    f[1, 2, 0] = -1.0
    m = np.asarray(pair_frame_mask(jnp.asarray(f)))
    assert m.tolist() == [[1, 0, 0, 0], [0, 0, 1, 0]]


def test_mosei_six_class_emotion_head(setup):
    """num_labels=6 (MOSEI emotion argmax mode): CE over 6 classes."""
    import dataclasses
    cfg6 = dataclasses.replace(CFG, num_labels=6)
    from msa_tpu.models.mmbert import init_mmbert_params as init6
    params6 = init6(jax.random.key(3), cfg6)
    assert params6["fusion"]["classifier2"]["kernel"].shape[-1] == 6
    _, ids, m_ids, labels, mask, visual, speech = setup
    out = mmbert_forward(params6, m_ids, mask, m_ids, m_ids, visual, speech,
                         cfg6, mlm_scores=False)
    ap = jnp.array([1, 0, 1, 1])
    target = jnp.array([0, 5, 2, 3], jnp.int32)
    l = mmbert_loss(params6, out, labels, labels, labels, ap, ap, target, cfg6)
    assert np.isfinite(float(l["loss"]))
    preds = np.asarray(l["predictions"])
    assert preds.shape == (4,)
    assert set(preds).issubset(set(range(6)))


def test_num_labels_7_uses_raw_logits(setup):
    """num_labels=7 regression: no tanh squash (ref applies tanh only for 1)."""
    import dataclasses
    cfg7 = dataclasses.replace(CFG, num_labels=7)
    params, ids, m_ids, labels, mask, visual, speech = setup
    out = mmbert_forward(params, m_ids, mask, m_ids, m_ids, visual, speech,
                         cfg7, mlm_scores=False)
    ap = jnp.array([1, 0, 1, 1])
    target = jnp.array([2.5, -1.2, 0.1, 2.9])
    l = mmbert_loss(params, out, labels, labels, labels, ap, ap, target, cfg7)
    np.testing.assert_allclose(np.asarray(l["predictions"]).reshape(-1),
                               np.asarray(out["logits"]).reshape(-1))
