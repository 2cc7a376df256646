"""Remat policies change memory/time only -- NEVER the math.

Pins loss + grads across every remat_policy (and no-remat) on a tiny
config; a policy whose checkpoint names drift out of sync with the
checkpoint_name() markers in models/bert.py would silently degrade to
full recompute or break -- this test catches the breakage half.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tpu.configs import MMBertConfig, tiny_bert_config
from msa_tpu.data.dataset import MultimodalDataset
from msa_tpu.data.featurize import synthetic_split
from msa_tpu.models.mmbert import init_mmbert_params, mmbert_forward, mmbert_loss
from msa_tpu.ops import masking

POLICIES = ["full", "dots", "save_small", "save_attn", "save_ctx",
            "save_wide", "full+drop", "save_ctx+drop", "save_attn+drop"]


def _loss_and_grad(remat, policy):
    cfg = MMBertConfig(bert=tiny_bert_config(), visual_dim=5, speech_dim=7)
    split = synthetic_split(4, 12, 5, 7, vocab_size=cfg.bert.vocab_size, seed=0)
    b = next(MultimodalDataset(split, seed=0).epoch_batches(0, 4))
    params = init_mmbert_params(jax.random.key(0), cfg)
    ids = jnp.asarray(b["text_ids"])
    kt, kv, ks = jax.random.split(jax.random.key(1), 3)
    t_ids, t_lab = masking.mask_tokens(kt, ids, 0.15, 4, (0, 2, 3, 4))
    tv_ids, tv_lab = masking.mask_tokens(kv, ids, 0.15, 4, (0, 2, 3, 4))
    ts_ids, ts_lab = masking.mask_tokens(ks, ids, 0.15, 4, (0, 2, 3, 4))

    def loss_fn(p):
        out = mmbert_forward(p, t_ids, jnp.asarray(b["text_mask"]), tv_ids,
                             ts_ids, jnp.asarray(b["visual"]),
                             jnp.asarray(b["speech"]), cfg,
                             deterministic=True, mlm_scores=False,
                             remat=remat, remat_policy=policy)
        return mmbert_loss(p, out, t_lab, tv_lab, ts_lab,
                           jnp.asarray(b["visual_ap"]),
                           jnp.asarray(b["speech_ap"]),
                           jnp.asarray(b["target"]), cfg,
                           weights=jnp.asarray(b["weight"]))["loss"]

    l, g = jax.value_and_grad(loss_fn)(params)
    return float(l), g


@pytest.mark.parametrize("policy", POLICIES)
def test_remat_policy_matches_no_remat(policy):
    l_ref, g_ref = _loss_and_grad(remat=False, policy="full")
    l, g = _loss_and_grad(remat=True, policy=policy)
    assert l == pytest.approx(l_ref, abs=1e-6)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def _loss_and_grad_flash(remat, policy):
    """Same as _loss_and_grad but with use_flash='always' so the short
    Pallas kernel (interpret mode on CPU) is on the path -- save_pack only
    engages when the packed kernel dispatches."""
    cfg = MMBertConfig(bert=tiny_bert_config(), visual_dim=5, speech_dim=7)
    split = synthetic_split(4, 12, 5, 7, vocab_size=cfg.bert.vocab_size, seed=0)
    b = next(MultimodalDataset(split, seed=0).epoch_batches(0, 4))
    params = init_mmbert_params(jax.random.key(0), cfg)
    ids = jnp.asarray(b["text_ids"])
    kt, kv, ks = jax.random.split(jax.random.key(1), 3)
    t_ids, t_lab = masking.mask_tokens(kt, ids, 0.15, 4, (0, 2, 3, 4))
    tv_ids, tv_lab = masking.mask_tokens(kv, ids, 0.15, 4, (0, 2, 3, 4))
    ts_ids, ts_lab = masking.mask_tokens(ks, ids, 0.15, 4, (0, 2, 3, 4))

    def loss_fn(p):
        out = mmbert_forward(p, t_ids, jnp.asarray(b["text_mask"]), tv_ids,
                             ts_ids, jnp.asarray(b["visual"]),
                             jnp.asarray(b["speech"]), cfg,
                             deterministic=True, mlm_scores=False,
                             use_flash="always",
                             remat=remat, remat_policy=policy)
        return mmbert_loss(p, out, t_lab, tv_lab, ts_lab,
                           jnp.asarray(b["visual_ap"]),
                           jnp.asarray(b["speech_ap"]),
                           jnp.asarray(b["target"]), cfg,
                           weights=jnp.asarray(b["weight"]))["loss"]

    l, g = jax.value_and_grad(loss_fn)(params)
    return float(l), g


def test_save_pack_matches_no_remat():
    """save_pack (packed q|k|v stash + packed kernel) is numerics-identity
    vs no-remat on the same kernel path."""
    l_ref, g_ref = _loss_and_grad_flash(remat=False, policy="full")
    l, g = _loss_and_grad_flash(remat=True, policy="save_pack")
    assert l == pytest.approx(l_ref, abs=1e-6)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_save_pack_degrades_to_save_attn_off_kernel():
    """Where the packed kernel cannot dispatch (XLA fallback path),
    save_pack silently behaves as save_attn -- still numerics-identity."""
    l_ref, g_ref = _loss_and_grad(remat=False, policy="full")
    l, g = _loss_and_grad(remat=True, policy="save_pack")
    assert l == pytest.approx(l_ref, abs=1e-6)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


PROBS_POLICIES = ["save_attn+probs", "save_attn+drop+probs",
                  "save_ctx+drop+probs", "full+probs"]


@pytest.mark.parametrize("policy", PROBS_POLICIES)
def test_probs_policy_matches_no_remat_on_kernel_path(policy):
    """'+probs' (stash signed post-softmax probs; backward skips the
    softmax recompute, ops/short_attention.py v2s) is numerics-identity
    vs no-remat where the short kernel dispatches (interpret on CPU)."""
    l_ref, g_ref = _loss_and_grad_flash(remat=False, policy="full")
    l, g = _loss_and_grad_flash(remat=True, policy=policy)
    assert l == pytest.approx(l_ref, abs=1e-6)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_probs_policy_degrades_off_kernel():
    """Where the short kernel cannot dispatch (XLA fallback path) the
    'attn_probs' name never fires and '+probs' behaves as its base --
    still numerics-identity."""
    l_ref, g_ref = _loss_and_grad(remat=False, policy="full")
    l, g = _loss_and_grad(remat=True, policy="save_attn+probs")
    assert l == pytest.approx(l_ref, abs=1e-6)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("policy", ["dots+drop", "auto+drop", "dots+probs"])
def test_suffix_with_incompatible_base_raises(policy):
    """+drop/+probs on a base that cannot honor the extra names must raise
    instead of silently degrading (round-3 ADVICE item 3)."""
    with pytest.raises(ValueError, match="does not compose"):
        _loss_and_grad(remat=True, policy=policy)
