"""uint8-threshold hidden dropout (models/bert._dropout, round 5).

The XLA-level dropout sites (embed / joint-embed / attn-out / MLP-down)
switch from f32-uniform bernoulli to uint8-vs-threshold keeps — FOUR
decisions per threefry u32 draw, the same t/256 rate snap the Pallas
kernels adopted in round 4 (ops/short_attention.quantize_dropout_rate) —
gated on the (global, GSPMD) sequence dim >= _BITS_DROPOUT_MIN_SEQ, the
shapes where the round-5 hardware A/B measured it winning (frame level
720.1 vs 735.2 ms/step; the S<=80 flagship keeps the f32 path).
Reference parity target: torch.nn.Dropout semantics used throughout
/root/reference/MMBertEmbedding.py and the HF encoder it delegates to —
keep-probability 1-p, kept values rescaled so the expectation is
unchanged.  This pins the snapped keep rate, the exactly-unbiased
rescale, the gradient mask, the per-key determinism, and the gate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tpu.models import bert
from msa_tpu.ops.short_attention import _DROP_QUANT

# 3-D with S >= _BITS_DROPOUT_MIN_SEQ -> the bits path (frame-level shapes)
BITS_SHAPE = (2, 512, 256)


@pytest.mark.parametrize("rate", [0.1, 0.3, 0.5])
def test_bits_dropout_keep_rate_and_unbiased(rate):
    assert bert._BITS_DROPOUT  # the shipped default
    key = jax.random.key(7)
    x = jnp.ones(BITS_SHAPE, jnp.float32)
    y = np.asarray(bert._dropout(key, x, rate, deterministic=False))
    t = min(max(int(round(rate * _DROP_QUANT)), 1), _DROP_QUANT - 1)
    keep = (y != 0).mean()
    # snapped keep probability, binomial noise bound ~4 sigma at n=262144
    assert keep == pytest.approx(1 - t / _DROP_QUANT, abs=4e-3)
    # kept values carry the SNAPPED-rate rescale -> exactly unbiased
    assert np.unique(y[y != 0]) == pytest.approx(_DROP_QUANT / (_DROP_QUANT - t))
    assert y.mean() == pytest.approx(1.0, abs=2e-2)


def test_bits_dropout_grad_is_scaled_mask():
    key = jax.random.key(3)
    x = jnp.ones(BITS_SHAPE, jnp.float32)
    y = np.asarray(bert._dropout(key, x, 0.1, deterministic=False))
    assert np.unique(y).size == 2  # bits path engaged (snapped 256/230 scale)
    g = np.asarray(jax.grad(
        lambda v: bert._dropout(key, v, 0.1, deterministic=False).sum())(x))
    np.testing.assert_array_equal(g, y)  # d/dx of where(keep, s*x, 0) = s*mask


def test_bits_dropout_deterministic_per_key_and_identity():
    x = jnp.ones(BITS_SHAPE, jnp.float32)
    a = bert._dropout(jax.random.key(1), x, 0.1, deterministic=False)
    b = bert._dropout(jax.random.key(1), x, 0.1, deterministic=False)
    c = bert._dropout(jax.random.key(2), x, 0.1, deterministic=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (np.asarray(a) != np.asarray(c)).any()
    np.testing.assert_array_equal(
        np.asarray(bert._dropout(jax.random.key(1), x, 0.1, True)), np.asarray(x))


def _bernoulli_ref(key, x, rate):
    return np.where(np.asarray(jax.random.bernoulli(key, 1 - rate, x.shape)),
                    np.asarray(x) / (1 - rate), 0.0).astype(np.float32)


def test_short_seq_keeps_f32_path():
    """The S=80 flagship shape stays on the rounds-1-4 bernoulli path."""
    key = jax.random.key(5)
    x = jnp.ones((4, 80, 256), jnp.float32)
    y = np.asarray(bert._dropout(key, x, 0.1, deterministic=False))
    np.testing.assert_array_equal(y, _bernoulli_ref(key, x, 0.1))


def test_f32_fallback_flag(monkeypatch):
    """--f32_dropout A/B flag: bits off restores bernoulli at EVERY shape."""
    monkeypatch.setattr(bert, "_BITS_DROPOUT", False)
    key = jax.random.key(5)
    x = jnp.ones(BITS_SHAPE, jnp.float32)
    y = np.asarray(bert._dropout(key, x, 0.1, deterministic=False))
    assert (y != 0).mean() == pytest.approx(0.9, abs=5e-3)
    np.testing.assert_array_equal(y, _bernoulli_ref(key, x, 0.1))
