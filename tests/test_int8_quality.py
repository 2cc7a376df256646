"""End-to-end quality gate for int8_static serving.

The hardware claim "int8_static predictions correlate ~0.987 with bf16"
(BENCH.md round 4) previously lived only in TPU runs; this gate reproduces
the whole path on CPU — fit a tiny MMBert on synthetic data (so activations
are structured, not random-init), calibrate static scales on held-out data,
quantize, and serve through the SAME fused LN+quantize Pallas kernels the
TPU path ships (forced on via bert._LN_QUANT_INTERPRET) — and fails if a
future quant change degrades predictions.  Same pattern as
tests/test_nu16_quality.py (round-4 VERDICT item 5).
"""

import numpy as np
import pytest

import jax

from msa_tpu.configs import build_experiment
from msa_tpu.data.dataset import MultimodalDataset
from msa_tpu.data.featurize import synthetic_split
from msa_tpu.inference import Predictor
from msa_tpu.training.trainer import Trainer

# 150 steps at lr 3e-3 memorizes the 32 synthetic labels (prediction std
# ~0.57, measured); at 20 steps the head is still near-constant and the
# correlation gate would be vacuous.  Steps are ~50 ms each on CPU — the
# fixture cost is dominated by the two interpret-mode predictors anyway.
N_STEPS = 150
B = 8


@pytest.fixture(scope="module")
def fitted():
    # beta=0: the -beta*NCE term saturates the tanh head into a constant on
    # unlearnable synthetic noise (BENCH.md round-2 CLI note), which would
    # make the correlation gate vacuous; with the label loss dominant the
    # tiny model memorizes the 32 synthetic labels and predictions vary.
    exp = build_experiment(dataset="mosi", model_name="tiny", num_labels=1,
                           alpha=0.1, beta=0.0,
                           train_batch_size=B, compute_dtype="float32",
                           learning_rate=3e-3)
    trainer = Trainer(exp)
    vdim, sdim = exp.model.visual_dim, exp.model.speech_dim
    vocab = exp.model.bert.vocab_size
    split = synthetic_split(B * 4, 16, vdim, sdim, vocab_size=vocab, seed=0)
    ds = MultimodalDataset(split, seed=0)
    state = trainer.init_state(jax.random.key(0), total_steps=N_STEPS)
    step = trainer._build_train_step()
    i = 0
    while i < N_STEPS:
        for batch in ds.epoch_batches(i, B, drop_last=True):
            if i >= N_STEPS:
                break
            state, _ = step(state, trainer._shard_batch(batch),
                            trainer.rng(i))
            i += 1
    held_out = synthetic_split(24, 16, vdim, sdim, vocab_size=vocab, seed=9)
    return exp, jax.device_get(state.params), held_out


def test_int8_static_predictions_track_full_precision(fitted):
    import msa_tpu.models.bert as bert_mod

    exp, params, held_out = fitted
    full = Predictor(exp, params, batch_size=B).predict_split(held_out)
    # non-vacuous: the fitted head must actually vary across inputs
    assert float(np.std(full)) > 1e-3

    assert bert_mod._LN_QUANT_INTERPRET is False
    try:
        bert_mod._LN_QUANT_INTERPRET = True  # force the shipped fused path
        q = Predictor(exp, params, batch_size=B, quantize="int8_static",
                      calibration=held_out).predict_split(held_out)
    finally:
        bert_mod._LN_QUANT_INTERPRET = False

    assert q.shape == full.shape
    corr = float(np.corrcoef(q, full)[0, 1])
    # hardware measures ~0.987 on bert-large; the tiny-model CPU gate sits
    # well above it — 0.98 catches any real regression without flaking on
    # quantization-boundary ties
    assert corr > 0.98, corr
    np.testing.assert_allclose(q, full, atol=0.15)


def test_int8_dynamic_predictions_track_full_precision(fitted):
    """Same gate for the dynamic-scale path (no calibration, no fused
    kernels — the composition path that multi-chip serving uses)."""
    exp, params, held_out = fitted
    full = Predictor(exp, params, batch_size=B).predict_split(held_out)
    q = Predictor(exp, params, batch_size=B,
                  quantize="int8").predict_split(held_out)
    corr = float(np.corrcoef(q, full)[0, 1])
    assert corr > 0.98, corr
