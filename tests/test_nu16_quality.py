"""Training-quality check for bf16 second-moment AdamW state (nu16).

Round-2 BENCH left ``adam_nu_dtype='bfloat16'`` opt-in pending a quality
check (VERDICT round-2 next-round item 1d): nu only feeds the update through
``1/(sqrt(nu_hat)+eps)``, so bf16's ~0.4% relative rounding perturbs the
effective per-parameter LR by <~0.2%% -- far inside Adam's own stochasticity
-- but that argument needed a measured trajectory, not a claim.  This test
trains the tiny MMBert twice (identical data/keys), nu in f32 vs bf16, and
asserts the loss trajectories track within a tolerance that a mis-scaled
update would blow through immediately (a 2x LR error moves these losses by
>10% within 30 steps).
"""

import dataclasses

import numpy as np

import jax

from msa_tpu.configs import build_experiment
from msa_tpu.data.dataset import MultimodalDataset
from msa_tpu.data.featurize import synthetic_split
from msa_tpu.training.trainer import Trainer

N_STEPS = 30
B = 8


def _losses(nu_dtype: str) -> np.ndarray:
    exp = build_experiment(dataset="mosi", model_name="tiny", num_labels=1,
                           train_batch_size=B, compute_dtype="float32",
                           learning_rate=1e-3)
    exp = dataclasses.replace(
        exp, train=dataclasses.replace(
            exp.train, adam_mu_dtype="bfloat16", adam_nu_dtype=nu_dtype))
    trainer = Trainer(exp)
    vdim, sdim = exp.model.visual_dim, exp.model.speech_dim
    split = synthetic_split(B * 4, 16, vdim, sdim,
                            vocab_size=exp.model.bert.vocab_size, seed=0)
    ds = MultimodalDataset(split, seed=0)
    state = trainer.init_state(jax.random.key(0), total_steps=N_STEPS)
    step = trainer._build_train_step()
    losses = []
    i = 0
    while i < N_STEPS:
        for batch in ds.epoch_batches(i, B, drop_last=True):
            if i >= N_STEPS:
                break
            state, m = step(state, trainer._shard_batch(batch),
                            trainer.rng(i))
            losses.append(float(jax.device_get(m["loss"])))
            i += 1
    return np.asarray(losses)


def test_nu16_loss_trajectory_tracks_f32():
    f32 = _losses("float32")
    bf16 = _losses("bfloat16")
    # same data, same init, same masks: only nu's rounding differs
    rel = np.abs(bf16 - f32) / np.maximum(np.abs(f32), 1e-6)
    assert rel[:5].max() < 1e-3   # early steps nearly exact
    assert rel.max() < 0.05       # late steps track within 5%
    # both must actually learn (trajectory decreasing), or the check is vacuous
    assert f32[-5:].mean() < f32[:5].mean()
    assert bf16[-5:].mean() < bf16[:5].mean()
