"""FusedAdamW (Pallas fused update) vs optax.adamw: exact semantics."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from msa_tpu.configs import (
    DataConfig, ExperimentConfig, MMBertConfig, TrainConfig, tiny_bert_config,
)
from msa_tpu.training.optim import (
    FusedAdamW, decay_mask, linear_warmup_decay, make_optimizer,
)


def tree():
    k = jax.random.split(jax.random.key(0), 4)
    return {
        "layers": {"wi": {"kernel": jax.random.normal(k[0], (3, 16, 40)),
                          "bias": jnp.zeros((3, 40))}},
        "ln": {"scale": jnp.ones((16,)), "bias": jnp.zeros((16,))},
        "head": {"kernel": jax.random.normal(k[1], (16, 5)) * 0.1,
                 "bias": jnp.zeros((5,))},
    }


def grads_for(params, seed):
    ks = jax.random.split(jax.random.key(seed), len(jax.tree.leaves(params)))
    flat, td = jax.tree.flatten(params)
    return jax.tree.unflatten(
        td, [jax.random.normal(k, p.shape) * 0.1 for k, p in zip(ks, flat)])


@pytest.mark.parametrize("use_pallas", [False, True])
def test_matches_optax_adamw(use_pallas):
    """5 steps of FusedAdamW == 5 steps of optax.adamw (schedule, bias
    correction, masked decoupled weight decay), to f32 roundoff.
    use_pallas=True runs the kernel in interpret mode on CPU."""
    sched = linear_warmup_decay(1e-3, 100, 0.1)
    fused = FusedAdamW(sched, weight_decay=0.01, use_pallas=use_pallas,
                       interpret=True)
    ref = optax.chain(optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-6,
                                  weight_decay=0.01, mask=decay_mask))

    p_f = tree()
    p_r = jax.tree.map(jnp.copy, p_f)
    s_f = fused.init(p_f)
    s_r = ref.init(p_r)
    for step in range(5):
        g = grads_for(p_f, step)
        p_f, s_f = fused.apply(p_f, g, s_f)
        u, s_r = ref.update(g, s_r, p_r)
        p_r = optax.apply_updates(p_r, u)
        for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-6)


def test_grad_clip_matches_optax():
    sched = lambda _: 1e-2
    fused = FusedAdamW(sched, weight_decay=0.0, max_grad_norm=0.1,
                       use_pallas=False)
    ref = optax.chain(optax.clip_by_global_norm(0.1),
                      optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-6,
                                  weight_decay=0.0, mask=decay_mask))
    p_f = tree()
    p_r = jax.tree.map(jnp.copy, p_f)
    s_f, s_r = fused.init(p_f), ref.init(p_r)
    g = grads_for(p_f, 7)
    p_f, s_f = fused.apply(p_f, g, s_f)
    u, s_r = ref.update(g, s_r, p_r)
    p_r = optax.apply_updates(p_r, u)
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_trainer_with_fused_optimizer():
    """End-to-end: the train step with fused_optimizer=True runs, updates
    params, and stays finite on the 8-device CPU mesh."""
    from msa_tpu.data import MultimodalDataset, synthetic_split
    from msa_tpu.training import Trainer

    bert = tiny_bert_config(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            vocab_size=120)
    exp = ExperimentConfig(
        model_name="tiny",
        model=MMBertConfig(bert=bert, visual_dim=5, speech_dim=7, num_labels=1),
        data=DataConfig(dataset="mosi", max_seq_length=16),
        train=TrainConfig(compute_dtype="float32", data_parallel=-1,
                          learning_rate=1e-3, fused_optimizer=True,
                          use_flash_attention="never"))
    tr = Trainer(exp, mask_token_id=4, special_ids=(0, 1, 2, 3, 4))
    state = tr.init_state(jax.random.key(0), 10)
    assert "count" in state.opt_state
    ds = MultimodalDataset(synthetic_split(16, 16, 5, 7, vocab_size=120,
                                           seed=0), seed=0)
    batch = next(ds.epoch_batches(0, 8))
    fn = tr._build_train_step()
    before = np.asarray(jax.device_get(
        state.params["fusion"]["classifier1"]["kernel"])).copy()
    state, m = fn(state, tr._shard_batch(batch), jax.random.key(1))
    state, m = fn(state, tr._shard_batch(batch), jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    assert int(jax.device_get(state.opt_state["count"])) == 2
    after = np.asarray(jax.device_get(
        state.params["fusion"]["classifier1"]["kernel"]))
    assert not np.array_equal(before, after)
