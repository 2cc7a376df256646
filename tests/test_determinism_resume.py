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


def _fit_exp(n_epochs):
    import dataclasses
    e = exp()
    return dataclasses.replace(
        e, train=dataclasses.replace(
            e.train, n_epochs=n_epochs, train_batch_size=8, val_batch_size=8,
            test_batch_size=8, patience=10))


def _datasets():
    mk = lambda n, s: MultimodalDataset(
        synthetic_split(n, 16, 5, 7, vocab_size=120, seed=s), seed=s)
    return mk(24, 0), mk(8, 1), mk(8, 2)


def test_fit_resume_restores_selection_state(tmp_path):
    """Kill-and-resume mid-fit reproduces the uninterrupted FitResult
    exactly: best_*, history and patience accounting survive the restart
    (round-1 resumed runs restarted selection from scratch)."""
    tr_ds, va_ds, te_ds = _datasets()

    # uninterrupted 3-epoch fit
    tr1 = Trainer(_fit_exp(3), **MASK)
    s1 = tr1.init_state(jax.random.key(0), 100)
    _, full = tr1.fit(s1, tr_ds, va_ds, te_ds,
                      checkpoint_dir=str(tmp_path / "full"),
                      rng=tr1.rng(5))

    # interrupted after epoch 0's improvement checkpoint, then resumed the
    # way cli/train.py --resume does it
    tr2 = Trainer(_fit_exp(1), **MASK)
    s2 = tr2.init_state(jax.random.key(0), 100)
    _, part = tr2.fit(s2, tr_ds, va_ds, te_ds,
                      checkpoint_dir=str(tmp_path / "part"),
                      rng=tr2.rng(5))

    from msa_tpu.training.checkpoint import resolve_checkpoint
    from msa_tpu.training.trainer import FitResult
    ckpt = resolve_checkpoint(str(tmp_path / "part"))
    tr3 = Trainer(_fit_exp(3), **MASK)
    template = tr3.init_state(jax.random.key(42), 100)  # different init
    s3, meta = load_checkpoint(ckpt, template)
    resume_result = FitResult.from_meta(meta["fit"], ckpt)
    assert resume_result.best_preds is not None
    _, resumed = tr3.fit(s3, tr_ds, va_ds, te_ds,
                         checkpoint_dir=str(tmp_path / "part"),
                         rng=tr3.rng(5),
                         start_epoch=int(meta["epoch"]) + 1,
                         resume_result=resume_result)

    assert resumed.best_epoch == full.best_epoch
    assert resumed.best_acc == pytest.approx(full.best_acc, abs=1e-6)
    assert resumed.best_mae == pytest.approx(full.best_mae, abs=1e-5)
    assert [h["epoch"] for h in resumed.history] == [h["epoch"] for h in full.history]
    for k in ("val_acc", "test_acc", "test_mae"):
        got = [h[k] for h in resumed.history]
        want = [h[k] for h in full.history]
        np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(resumed.best_preds, full.best_preds, atol=1e-5)


def test_model_num_selection(tmp_path):
    """Numbered retention: every improvement keeps its own checkpoint and
    resolve_checkpoint(--model_num) picks a specific one."""
    from msa_tpu.training.checkpoint import (
        list_epoch_checkpoints, resolve_checkpoint,
    )
    tr_ds, va_ds, te_ds = _datasets()
    tr = Trainer(_fit_exp(3), **MASK)
    st = tr.init_state(jax.random.key(0), 100)
    _, result = tr.fit(st, tr_ds, va_ds, te_ds,
                       checkpoint_dir=str(tmp_path), rng=tr.rng(5))
    epochs = list_epoch_checkpoints(str(tmp_path))
    assert epochs, "no retained checkpoints"
    assert result.best_epoch == epochs[-1]
    # newest == default resolution; a specific epoch resolves to its own dir
    assert resolve_checkpoint(str(tmp_path)).endswith(f"epoch_{epochs[-1]:03d}")
    first = resolve_checkpoint(str(tmp_path), epochs[0])
    assert first.endswith(f"epoch_{epochs[0]:03d}")
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint(str(tmp_path), 99)
