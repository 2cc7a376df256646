"""Optimizer: decay masking, schedule shape, grad accumulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from msa_tpu.configs import MMBertConfig, TrainConfig, tiny_bert_config
from msa_tpu.models.mmbert import init_mmbert_params
from msa_tpu.training.optim import decay_mask, linear_warmup_decay, make_optimizer


def test_decay_mask_excludes_bias_and_layernorm():
    cfg = MMBertConfig(bert=tiny_bert_config(), visual_dim=5, speech_dim=7)
    params = init_mmbert_params(jax.random.key(0), cfg)
    mask = decay_mask(params)
    assert mask["bert"]["layers"]["q"]["kernel"] is True
    assert mask["bert"]["layers"]["q"]["bias"] is False
    assert mask["bert"]["layers"]["attn_ln"]["scale"] is False
    assert mask["bert"]["layers"]["attn_ln"]["bias"] is False
    assert mask["bert"]["embeddings"]["ln"]["scale"] is False
    assert mask["bert"]["embeddings"]["word"] is True
    assert mask["cls"]["transform_ln"]["scale"] is False
    assert mask["fusion"]["classifier1"]["kernel"] is True


def test_schedule_warmup_then_decay():
    sched = linear_warmup_decay(1e-3, total_steps=100, warmup_proportion=0.1)
    assert float(sched(0)) == 0.0
    assert float(sched(10)) == pytest.approx(1e-3)
    assert float(sched(55)) == pytest.approx(1e-3 * 0.5, rel=1e-6)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)


def test_gradient_accumulation_equivalence():
    """MultiSteps(k=2) over half-batches == one step over the full batch."""
    tc1 = TrainConfig(learning_rate=1e-2, warmup_proportion=0.0,
                      gradient_accumulation_steps=1, weight_decay=0.0)
    tc2 = TrainConfig(learning_rate=1e-2, warmup_proportion=0.0,
                      gradient_accumulation_steps=2, weight_decay=0.0)
    params = {"w": jnp.ones((4,))}
    g_full = {"w": jnp.array([1.0, 2.0, 3.0, 4.0])}
    g_a = {"w": jnp.array([0.0, 1.0, 2.0, 3.0])}
    g_b = {"w": jnp.array([2.0, 3.0, 4.0, 5.0])}  # mean = g_full

    tx1 = make_optimizer(tc1, 10)
    s1 = tx1.init(params)
    u1, _ = tx1.update(g_full, s1, params)
    p1 = optax.apply_updates(params, u1)

    tx2 = make_optimizer(tc2, 10)
    s2 = tx2.init(params)
    u2a, s2 = tx2.update(g_a, s2, params)
    p2 = optax.apply_updates(params, u2a)  # no-op update (zeros)
    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(params["w"]))
    u2b, s2 = tx2.update(g_b, s2, p2)
    p2 = optax.apply_updates(p2, u2b)
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p2["w"]),
                               rtol=1e-6)
