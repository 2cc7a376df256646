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


def test_scale_by_adam_casted_matches_optax_adamw():
    """The custom nu-dtype path (f32/f32 storage) is bit-identical to
    optax.adamw over several steps; bf16 nu tracks it closely."""
    import dataclasses

    from msa_tpu.training.optim import scale_by_adam_casted

    rng = np.random.default_rng(0)
    params = {"w": {"kernel": jnp.asarray(rng.standard_normal((4, 3)),
                                          jnp.float32),
                    "bias": jnp.zeros((3,), jnp.float32)}}
    tc = TrainConfig(learning_rate=3e-3, warmup_proportion=0.0,
                     weight_decay=0.01)
    ref_tx = make_optimizer(tc, 20)  # nu float32 -> stock optax.adamw
    cast_tx = make_optimizer(dataclasses.replace(tc, adam_nu_dtype="bfloat16"),
                             20)
    # stock vs custom with f32 storage: exact
    sched = linear_warmup_decay(tc.learning_rate, 20, 0.0)
    exact_tx = optax.chain(scale_by_adam_casted(),
                           optax.add_decayed_weights(0.01, mask=decay_mask),
                           optax.scale_by_learning_rate(sched))

    p_ref, s_ref = dict(params), ref_tx.init(params)
    p_ex, s_ex = dict(params), exact_tx.init(params)
    p_c, s_c = dict(params), cast_tx.init(params)
    for i in range(5):
        g = {"w": {"kernel": jnp.asarray(rng.standard_normal((4, 3)),
                                         jnp.float32),
                   "bias": jnp.asarray(rng.standard_normal((3,)),
                                       jnp.float32)}}
        u, s_ref = ref_tx.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        u, s_ex = exact_tx.update(g, s_ex, p_ex)
        p_ex = optax.apply_updates(p_ex, u)
        u, s_c = cast_tx.update(g, s_c, p_c)
        p_c = optax.apply_updates(p_c, u)
    np.testing.assert_array_equal(np.asarray(p_ref["w"]["kernel"]),
                                  np.asarray(p_ex["w"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(p_ref["w"]["bias"]),
                                  np.asarray(p_ex["w"]["bias"]))
    # bf16 nu: same trajectory within bf16 denominator precision
    np.testing.assert_allclose(np.asarray(p_ref["w"]["kernel"]),
                               np.asarray(p_c["w"]["kernel"]),
                               rtol=0, atol=2e-4)
    # and the nu state is actually stored compactly
    is_adam = lambda x: isinstance(x, optax.ScaleByAdamState)
    adam_states = [s for s in jax.tree_util.tree_leaves(s_c, is_leaf=is_adam)
                   if is_adam(s)]
    assert adam_states
    assert adam_states[0].nu["w"]["kernel"].dtype == jnp.bfloat16


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
