"""Loss semantics vs torch and MLM masking distribution tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tpu.ops import losses as L
from msa_tpu.ops.masking import mask_tokens

torch = pytest.importorskip("torch")


def test_cross_entropy_matches_torch_ignore_index():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 9, 11)).astype(np.float32)
    labels = rng.integers(0, 11, size=(4, 9))
    labels[0, :5] = -100
    labels[2] = -100
    ref = torch.nn.CrossEntropyLoss()(
        torch.tensor(logits).view(-1, 11), torch.tensor(labels).view(-1)
    ).item()
    ours = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_cross_entropy_all_ignored_is_zero_not_nan():
    logits = jnp.zeros((2, 3, 5))
    labels = jnp.full((2, 3), -100)
    assert float(L.cross_entropy(logits, labels)) == 0.0


def test_cross_entropy_weights_drop_padded_rows():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((4, 6, 7)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 7, size=(4, 6)))
    w = jnp.array([1.0, 1.0, 0.0, 0.0])
    ref = float(L.cross_entropy(logits[:2], labels[:2]))
    ours = float(L.cross_entropy(logits, labels, weights=w))
    assert ours == pytest.approx(ref, rel=1e-6)
    # changing padded rows' contents must not change the loss
    logits2 = logits.at[3].set(99.0)
    assert float(L.cross_entropy(logits2, labels, weights=w)) == pytest.approx(ours, rel=1e-6)


def test_mse_matches_torch():
    rng = np.random.default_rng(2)
    a = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    ref = torch.nn.MSELoss()(torch.tensor(a), torch.tensor(b)).item()
    assert float(L.mse(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(ref, rel=1e-6)


def test_infonce_matches_reference_formula():
    """Pin to the reference CPC math (MMBertEmbedding.py:21-32)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 8)).astype(np.float32)
    xp = rng.standard_normal((5, 8)).astype(np.float32)
    xt = torch.tensor(x); xpt = torch.tensor(xp)
    xpt_n = xpt / xpt.norm(dim=1, keepdim=True)
    xt_n = xt / xt.norm(dim=1, keepdim=True)
    pos = torch.sum(xt_n * xpt_n, dim=-1)
    neg = torch.logsumexp(torch.matmul(xt_n, xpt_n.t()), dim=-1)
    ref = -(pos - neg).mean().item()
    ours = float(L.infonce(jnp.asarray(x), jnp.asarray(xp)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_infonce_weights_exclude_padded_rows():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((6, 8)).astype(np.float32)
    xp = rng.standard_normal((6, 8)).astype(np.float32)
    w = jnp.array([1, 1, 1, 1, 0, 0], jnp.float32)
    ref = float(L.infonce(jnp.asarray(x[:4]), jnp.asarray(xp[:4])))
    ours = float(L.infonce(jnp.asarray(x), jnp.asarray(xp), weights=w))
    assert ours == pytest.approx(ref, rel=1e-5)


class TestMasking:
    def test_special_tokens_never_masked(self):
        ids = jnp.array([[101, 500, 600, 102, 0, 0]] * 256)
        out, labels = mask_tokens(jax.random.key(0), ids, mlm_probability=0.9)
        arr = np.asarray(out)
        lab = np.asarray(labels)
        assert (arr[:, 0] == 101).all()
        assert (arr[:, 3] == 102).all()
        assert (arr[:, 4:] == 0).all()
        assert (lab[:, 0] == -100).all()
        assert (lab[:, 4:] == -100).all()

    def test_mask_rate_and_replace_rate(self):
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(1000, 30000, size=(512, 40)))
        out, labels = mask_tokens(jax.random.key(1), ids, mlm_probability=0.15)
        lab = np.asarray(labels)
        masked = lab != -100
        rate = masked.mean()
        assert 0.13 < rate < 0.17
        replaced = (np.asarray(out) == 103) & masked
        frac = replaced.sum() / masked.sum()
        assert 0.77 < frac < 0.83
        # unmasked positions unchanged
        keep = ~masked
        assert (np.asarray(out)[keep] == np.asarray(ids)[keep]).all()
        # labels at masked positions are original ids
        assert (lab[masked] == np.asarray(ids)[masked]).all()

    def test_deterministic_given_key(self):
        ids = jnp.asarray(np.random.default_rng(5).integers(1000, 2000, (8, 10)))
        a1 = mask_tokens(jax.random.key(7), ids)
        a2 = mask_tokens(jax.random.key(7), ids)
        assert (np.asarray(a1[0]) == np.asarray(a2[0])).all()
