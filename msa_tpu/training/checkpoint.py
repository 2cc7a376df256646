"""Checkpoint / resume: full train state, not just weights.

The reference saves only ``model.state_dict()`` on test-acc improvement and
cannot resume mid-run (no optimizer/scheduler/step state -- SURVEY.md
section 5.4).  Here a checkpoint carries params + optimizer state + step +
epoch + data-order seed + the experiment config, so training resumes
bit-exactly.  Serialization is flax msgpack (host-gathered); works for both
single- and multi-chip states.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..configs import ExperimentConfig
from .train_state import TrainState

STATE_FILE = "state.msgpack"
META_FILE = "meta.json"
CONFIG_FILE = "config.json"
EPOCH_DIR_FMT = "epoch_{:03d}"


def epoch_dir(directory: str, epoch: int) -> str:
    """Numbered per-improvement checkpoint subdir (the reference keeps
    ``model_<epoch>.pt`` for every improvement, ref trainer.py:268-269, and
    sampling selects one by --model_num, ref sampling.py:342-344)."""
    return os.path.join(directory, EPOCH_DIR_FMT.format(epoch))


def _has_state(directory: str) -> bool:
    """A checkpoint dir holds either the msgpack state or an orbax subdir."""
    return (os.path.exists(os.path.join(directory, STATE_FILE))
            or os.path.isdir(os.path.join(directory, ORBAX_SUBDIR)))


def list_epoch_checkpoints(directory: str):
    """Sorted epoch numbers of the retained checkpoints under ``directory``."""
    out = []
    if os.path.isdir(directory):
        for name in os.listdir(directory):
            if name.startswith("epoch_") and _has_state(
                    os.path.join(directory, name)):
                try:
                    out.append(int(name[len("epoch_"):]))
                except ValueError:
                    pass
    return sorted(out)


def resolve_checkpoint(directory: str, model_num: Optional[int] = None) -> str:
    """Resolve a run dir (holding epoch_NNN subdirs) or a direct checkpoint
    dir to the directory containing ``state.msgpack``.

    ``model_num`` selects a specific retained epoch (ref sampling.py's
    --model_num); default is the newest (= best-so-far) checkpoint.
    """
    if model_num is not None:
        d = epoch_dir(directory, model_num)
        if not _has_state(d):
            avail = list_epoch_checkpoints(directory)
            raise FileNotFoundError(
                f"no checkpoint for epoch {model_num} in {directory}; "
                f"available epochs: {avail}")
        return d
    if _has_state(directory):
        return directory
    epochs = list_epoch_checkpoints(directory)
    if not epochs:
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    return epoch_dir(directory, epochs[-1])


def save_checkpoint(
    directory: str,
    state: TrainState,
    config: Optional[ExperimentConfig] = None,
    epoch: int = 0,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    os.makedirs(directory, exist_ok=True)
    host_state = jax.device_get(state)
    with open(os.path.join(directory, STATE_FILE), "wb") as f:
        f.write(serialization.to_bytes(host_state))
    meta = {"epoch": int(epoch), "step": int(np.asarray(host_state.step))}
    if extra:
        meta.update(extra)
    with open(os.path.join(directory, META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    if config is not None:
        with open(os.path.join(directory, CONFIG_FILE), "w") as f:
            f.write(config.to_json())
    return directory


def load_checkpoint(directory: str, template: TrainState) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the structure of ``template`` (same config/optimizer)."""
    with open(os.path.join(directory, STATE_FILE), "rb") as f:
        state = serialization.from_bytes(template, f.read())
    meta_path = os.path.join(directory, META_FILE)
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def load_config(directory: str) -> Optional[ExperimentConfig]:
    path = os.path.join(directory, CONFIG_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return ExperimentConfig.from_json(f.read())


# ---------------------------------------------------------------------------
# Orbax backend (sharded, async-capable) -- the production-scale path.
# msgpack above host-gathers the full state (fine at bert-large, 1 host);
# orbax writes each shard from its owner, which is what multi-host needs.
# ---------------------------------------------------------------------------

ORBAX_SUBDIR = "orbax"


def save_checkpoint_sharded(
    directory: str,
    state: TrainState,
    config: Optional[ExperimentConfig] = None,
    epoch: int = 0,
) -> str:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, ORBAX_SUBDIR)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    meta = {"epoch": int(epoch), "step": int(jax.device_get(state.step)),
            "format": "orbax"}
    with open(os.path.join(directory, META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    if config is not None:
        with open(os.path.join(directory, CONFIG_FILE), "w") as f:
            f.write(config.to_json())
    return directory


def save_checkpoint_auto(
    directory: str,
    state: TrainState,
    config: Optional[ExperimentConfig] = None,
    epoch: int = 0,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Pick the serializer by process topology: single-process runs
    host-gather to msgpack (simple, greppable); multi-process runs MUST use
    the orbax per-shard path -- ``jax.device_get`` of a non-addressable
    global array would fail, and each process owns only its shards."""
    if jax.process_count() > 1:
        d = save_checkpoint_sharded(directory, state, config, epoch)
        if extra and jax.process_index() == 0:
            meta_path = os.path.join(directory, META_FILE)
            with open(meta_path) as f:
                meta = json.load(f)
            meta.update(extra)
            with open(meta_path, "w") as f:
                json.dump(meta, f, indent=2)
        return d
    return save_checkpoint(directory, state, config, epoch, extra)


def load_checkpoint_auto(directory: str, template: TrainState
                         ) -> Tuple[TrainState, Dict[str, Any]]:
    """Dispatch on what the checkpoint dir actually contains (meta.json
    ``format`` / the orbax subdir), so msgpack checkpoints restore into
    multi-process runs and vice versa."""
    if (os.path.isdir(os.path.join(directory, ORBAX_SUBDIR))
            and not os.path.exists(os.path.join(directory, STATE_FILE))):
        return load_checkpoint_sharded(directory, template)
    return load_checkpoint(directory, template)


def load_checkpoint_sharded(directory: str, template: TrainState
                            ) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore with the TEMPLATE's shardings (resharding on restore is how
    you change mesh shape between runs)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    path = os.path.join(directory, ORBAX_SUBDIR)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None)),
        jax.tree.map(lambda x: x, template))
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, abstract)
    meta_path = os.path.join(directory, META_FILE)
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
