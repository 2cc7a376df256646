"""Reproducibility + checkpoint-resume fidelity.

The reference has no resume path and unseeded RNG everywhere
(SURVEY.md sections 5.3-5.4, 7).  Here:
  * same seed -> bit-identical training trajectory;
  * save-after-epoch-0 + resume == uninterrupted 2-epoch run, exactly
    (epoch-keyed data order + step-keyed masking make resume seamless).
"""

import numpy as np
import pytest

import jax

from msa_tpu.configs import (
    DataConfig, ExperimentConfig, MMBertConfig, TrainConfig, tiny_bert_config,
)
from msa_tpu.data import MultimodalDataset, synthetic_split
from msa_tpu.training import Trainer, load_checkpoint, save_checkpoint

MASK = dict(mask_token_id=4, special_ids=(0, 1, 2, 3, 4))


def exp():
    bert = tiny_bert_config(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            vocab_size=120)
    return ExperimentConfig(
        model_name="tiny",
        model=MMBertConfig(bert=bert, visual_dim=5, speech_dim=7, num_labels=1),
        data=DataConfig(dataset="mosi", max_seq_length=16),
        train=TrainConfig(compute_dtype="float32", data_parallel=1,
                          learning_rate=1e-3, warmup_proportion=0.0,
                          use_flash_attention="never"),
    )


def dataset():
    return MultimodalDataset(
        synthetic_split(24, 16, 5, 7, vocab_size=120, seed=0), seed=0)


def leaves(state):
    return [np.asarray(x) for x in jax.tree.leaves(jax.device_get(state.params))]


def run_epochs(trainer, state, ds, epochs, rng):
    for e in epochs:
        state, _ = trainer.train_epoch(state, ds, e, rng)
    return state


def test_same_seed_same_trajectory():
    ds = dataset()
    outs = []
    for _ in range(2):
        tr = Trainer(exp(), **MASK)
        st = tr.init_state(jax.random.key(0), 100)
        st = run_epochs(tr, st, ds, [0, 1], tr.rng(5))
        outs.append(leaves(st))
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)


def test_resume_matches_uninterrupted(tmp_path):
    ds = dataset()

    # uninterrupted: epochs 0 and 1
    tr1 = Trainer(exp(), **MASK)
    s1 = tr1.init_state(jax.random.key(0), 100)
    s1 = run_epochs(tr1, s1, ds, [0, 1], tr1.rng(5))

    # interrupted: epoch 0, save, fresh process restores, epoch 1
    tr2 = Trainer(exp(), **MASK)
    s2 = tr2.init_state(jax.random.key(0), 100)
    s2 = run_epochs(tr2, s2, ds, [0], tr2.rng(5))
    save_checkpoint(str(tmp_path), s2, tr2.config, epoch=0)

    tr3 = Trainer(exp(), **MASK)
    template = tr3.init_state(jax.random.key(42), 100)  # different init
    s3, meta = load_checkpoint(str(tmp_path), template)
    assert meta["epoch"] == 0
    s3 = run_epochs(tr3, s3, ds, [1], tr3.rng(5))

    for a, b in zip(leaves(s1), leaves(s3)):
        np.testing.assert_allclose(a, b, atol=1e-6)
