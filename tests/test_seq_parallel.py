"""Sequence parallelism + head-parallel Pallas attention under TP.

Both features are pure layout transformations: loss/grads must be
identical (up to f32 roundoff) to the unsharded computation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tpu.configs import (
    DataConfig, ExperimentConfig, MMBertConfig, TrainConfig, tiny_bert_config,
)
from msa_tpu.data import MultimodalDataset, synthetic_split
from msa_tpu.models import init_mmbert_params
from msa_tpu.ops.attention import multi_head_attention
from msa_tpu.parallel import make_mesh
from msa_tpu.training import Trainer


def tiny_experiment(**train_kw):
    bert = tiny_bert_config(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            vocab_size=120)
    kw = dict(n_epochs=1, train_batch_size=8, val_batch_size=8,
              test_batch_size=8, compute_dtype="float32",
              learning_rate=1e-3, data_parallel=2, model_parallel=4,
              use_flash_attention="never")
    kw.update(train_kw)
    return ExperimentConfig(
        model_name="tiny",
        model=MMBertConfig(bert=bert, visual_dim=5, speech_dim=7,
                           num_labels=1),
        data=DataConfig(dataset="mosi", num_labels=1, max_seq_length=16),
        train=TrainConfig(**kw),
    )


MASK_ARGS = dict(mask_token_id=4, special_ids=(0, 1, 2, 3, 4))


def _one_step_loss(exp):
    trainer = Trainer(exp, **MASK_ARGS)
    state = trainer.init_state(jax.random.key(0), total_steps=10)
    ds = MultimodalDataset(
        synthetic_split(8, 16, 5, 7, vocab_size=120, seed=0), seed=0)
    batch = trainer._shard_batch(next(ds.epoch_batches(0, 8)))
    step = trainer._build_train_step()
    state2, metrics = step(state, batch, jax.random.key(1))
    return float(metrics["loss"]), state2


def test_sequence_parallel_matches_baseline():
    base_loss, base_state = _one_step_loss(tiny_experiment())
    sp_loss, sp_state = _one_step_loss(
        tiny_experiment(sequence_parallel=True))
    assert sp_loss == pytest.approx(base_loss, rel=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(base_state.params)),
                    jax.tree.leaves(jax.device_get(sp_state.params))):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_sequence_parallel_eval_matches():
    exp = tiny_experiment()
    exp_sp = tiny_experiment(sequence_parallel=True)
    t = Trainer(exp, **MASK_ARGS)
    tsp = Trainer(exp_sp, **MASK_ARGS)
    state = t.init_state(jax.random.key(0), 10)
    ds = MultimodalDataset(
        synthetic_split(8, 16, 5, 7, vocab_size=120, seed=1), seed=1)
    em, p, l = t.eval_epoch(state, ds, 0, jax.random.key(2), 8)
    state_sp = tsp.init_state(jax.random.key(0), 10)
    em2, p2, l2 = tsp.eval_epoch(state_sp, ds, 0, jax.random.key(2), 8)
    np.testing.assert_allclose(p, p2, atol=1e-5)


def test_frame_level_with_tp_and_sp():
    """Feature composition: frame-level pair length x dp x tp x sequence
    parallelism in one train step, loss equal to the plain configuration."""
    import dataclasses

    from msa_tpu.data.featurize import synthetic_split as synth

    def build(sp, dp, mp):
        exp = tiny_experiment(data_parallel=dp, model_parallel=mp,
                              sequence_parallel=sp)
        exp = dataclasses.replace(
            exp, data=dataclasses.replace(exp.data, pair_seq_length=32))
        return exp

    split = synth(8, 16, 5, 7, vocab_size=120, seed=0, pair_seq_length=32)
    ds = MultimodalDataset(split, seed=0)

    losses = []
    for sp, dp, mp in [(False, 1, 1), (True, 2, 4)]:
        exp = build(sp, dp, mp)
        tr = Trainer(exp, **MASK_ARGS)
        state = tr.init_state(jax.random.key(0), 10)
        batch = tr._shard_batch(next(ds.epoch_batches(0, 8)))
        step = tr._build_train_step()
        _, m = step(state, batch, jax.random.key(1))
        losses.append(float(m["loss"]))
        assert int(m["mlm_overflow"]) == 0
    assert losses[1] == pytest.approx(losses[0], rel=1e-5)


def test_sharded_flash_attention_matches_unsharded():
    """Head-parallel flash kernel under TP == single call (interpret, no
    dropout) at a flash-dispatched length."""
    rng = np.random.default_rng(1)
    b, s, h, n = 2, 1024, 64, 4
    q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32) * 0.2
    k = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32) * 0.2
    v = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    mask = np.ones((b, s), np.float32)
    mask[0, 900:] = 0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :])

    plain = multi_head_attention(q, k, v, bias, num_heads=n,
                                 use_flash="always")
    mesh = make_mesh(2, 4)
    sharded = jax.jit(
        lambda q, k, v, bias: multi_head_attention(
            q, k, v, bias, num_heads=n, use_flash="always", mesh=mesh)
    )(q, k, v, bias)
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(plain)[m], np.asarray(sharded)[m],
                               atol=1e-5, rtol=1e-5)


def test_sharded_short_attention_gradients_match():
    """Backward through the shard_map head-parallel short kernel == the
    unsharded kernel's gradients."""
    rng = np.random.default_rng(2)
    b, s, h, n = 8, 24, 64, 4
    q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    mask = np.ones((b, s), np.float32)
    mask[1, 12:] = 0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :])
    w = jnp.asarray(mask)[:, :, None]
    mesh = make_mesh(2, 4)

    def loss(mesh_arg):
        def f(q, k, v):
            out = multi_head_attention(q, k, v, bias, num_heads=n,
                                       use_flash="always", mesh=mesh_arg)
            return jnp.sum(out ** 2 * w)
        return f

    g_plain = jax.grad(loss(None), argnums=(0, 1, 2))(q, k, v)
    g_shard = jax.jit(jax.grad(loss(mesh), argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(g_plain, g_shard):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4)


def test_sharded_short_attention_matches_unsharded():
    """shard_map head-parallel short kernel == single call (interpret, no
    dropout) on a dp x mp mesh."""
    rng = np.random.default_rng(0)
    b, s, h, n = 8, 24, 64, 4
    q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    mask = np.ones((b, s), np.float32)
    mask[0, 10:] = 0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :])

    plain = multi_head_attention(q, k, v, bias, num_heads=n,
                                 use_flash="always")
    mesh = make_mesh(2, 4)
    sharded = jax.jit(
        lambda q, k, v, bias: multi_head_attention(
            q, k, v, bias, num_heads=n, use_flash="always", mesh=mesh)
    )(q, k, v, bias)
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(plain)[m], np.asarray(sharded)[m],
                               atol=1e-5, rtol=1e-5)
