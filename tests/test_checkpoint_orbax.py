"""Orbax sharded checkpoint backend: roundtrip on the 8-device mesh."""

import numpy as np
import pytest

import jax

from msa_tpu.configs import (
    DataConfig, ExperimentConfig, MMBertConfig, TrainConfig, tiny_bert_config,
)
from msa_tpu.training.checkpoint import (
    load_checkpoint_sharded, save_checkpoint_sharded,
)
from msa_tpu.training.trainer import Trainer


def tiny_exp(dp=-1, mp=1):
    bert = tiny_bert_config(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            vocab_size=120)
    return ExperimentConfig(
        model_name="tiny",
        model=MMBertConfig(bert=bert, visual_dim=5, speech_dim=7, num_labels=1),
        data=DataConfig(dataset="mosi", max_seq_length=16),
        train=TrainConfig(compute_dtype="float32", data_parallel=dp,
                          model_parallel=mp, use_flash_attention="never"),
    )


def test_orbax_roundtrip_sharded(tmp_path):
    trainer = Trainer(tiny_exp(4, 2), mask_token_id=4, special_ids=(0, 2, 3, 4))
    state = trainer.init_state(jax.random.key(0), 10)
    save_checkpoint_sharded(str(tmp_path), state, trainer.config, epoch=2)

    trainer2 = Trainer(tiny_exp(4, 2), mask_token_id=4, special_ids=(0, 2, 3, 4))
    template = trainer2.init_state(jax.random.key(7), 10)
    restored, meta = load_checkpoint_sharded(str(tmp_path), template)
    assert meta["epoch"] == 2 and meta["format"] == "orbax"
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(restored.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_reshard_on_restore(tmp_path):
    """Save from a (4,2) mesh, restore into a (8,1) mesh."""
    t1 = Trainer(tiny_exp(4, 2), mask_token_id=4, special_ids=(0, 2, 3, 4))
    s1 = t1.init_state(jax.random.key(0), 10)
    save_checkpoint_sharded(str(tmp_path), s1, t1.config, epoch=0)

    t2 = Trainer(tiny_exp(8, 1), mask_token_id=4, special_ids=(0, 2, 3, 4))
    template = t2.init_state(jax.random.key(3), 10)
    restored, _ = load_checkpoint_sharded(str(tmp_path), template)
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(restored.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
