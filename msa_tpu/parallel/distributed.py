"""Multi-process (multi-host) execution support.

The reference is strictly single-process (SURVEY.md section 5.8); the
multi-chip story here is GSPMD over a Mesh, which is topology-agnostic --
the same jitted step runs on 1 process x N chips or M processes x N chips.
What multi-process ADDS is:

  * a ``jax.distributed.initialize`` call before any jax usage, so every
    process sees the same global device list (`initialize`);
  * global batch arrays assembled from per-process host data
    (`global_batch_array`): each process materializes the (identically
    seeded, hence identical) global numpy batch and contributes the shards
    its local devices own;
  * per-shard checkpointing (orbax) instead of host-gather msgpack --
    dispatched automatically by ``checkpoint.save_checkpoint_auto``.

Wired into ``cli/train.py`` via ``--coordinator/--num_processes/
--process_id``; smoke-tested with two real CPU processes in
``tests/test_multiprocess.py``.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    With no arguments jax auto-detects the environment (TPU pods, SLURM,
    ...); explicit arguments are for manual launches.  Must run before any
    other jax call in the process.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_batch_array(sharding, host_array: np.ndarray) -> jax.Array:
    """Build a global array from a host batch under any process topology.

    Every process holds the SAME full global numpy batch (the data plane is
    deterministic by seed, so each process computes it identically -- no
    inter-process data exchange needed at these batch sizes) and each
    device's shard is sliced out by its global index.  Unlike
    ``jax.device_put(host_array, sharding)``, this works when some shards
    live on non-addressable (other-process) devices.
    """
    return jax.make_array_from_callback(
        host_array.shape, sharding, lambda idx: host_array[idx])


def shard_host_batch(batch: Dict[str, np.ndarray], sharding
                     ) -> Dict[str, jax.Array]:
    """``global_batch_array`` over a whole batch dict."""
    return {k: global_batch_array(sharding, v) for k, v in batch.items()}


def process_env_defaults() -> Dict[str, Optional[str]]:
    """Manual-launch settings from the environment (mirrors the common
    torchrun-style variables) for CLIs that don't pass explicit flags."""
    return {
        "coordinator_address": os.environ.get("MSA_COORDINATOR"),
        "num_processes": (int(os.environ["MSA_NUM_PROCESSES"])
                          if "MSA_NUM_PROCESSES" in os.environ else None),
        "process_id": (int(os.environ["MSA_PROCESS_ID"])
                       if "MSA_PROCESS_ID" in os.environ else None),
    }
