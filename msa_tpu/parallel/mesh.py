"""Device mesh construction for data x model parallelism.

The reference has no distributed code at all (single pinned CUDA device,
ref train.py:22, config.py:5).  Here multi-chip is first-class: a 2-D
``jax.sharding.Mesh`` with a ``data`` axis (batch sharding, gradient psum
over ICI inserted by GSPMD) and a ``model`` axis (tensor parallelism over
attention heads / FFN / vocab).  DCN scale-out later attaches as an outer
axis on ``data``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.  ``data_parallel=-1`` -> all remaining."""
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if model_parallel <= 0:
        model_parallel = 1
    if data_parallel == -1:
        if n % model_parallel:
            raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
        data_parallel = n // model_parallel
    want = data_parallel * model_parallel
    if want > n:
        raise ValueError(f"requested {want} devices, have {n}")
    grid = np.asarray(devs[:want]).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_hybrid_mesh(
    dcn_data_parallel: int,
    ici_data_parallel: int = -1,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    slice_ids: Optional[Sequence[int]] = None,
) -> Mesh:
    """Multi-slice mesh: pure data parallelism over DCN (slow, between
    slices), data x model over ICI (fast, within a slice).

    The invariant that makes collectives cheap: every ``model``-axis group
    and every within-slice block of the ``data`` axis contains devices of
    ONE slice (ICI); only the outermost blocks of the gradient psum cross
    DCN (the SURVEY.md section 5.8 seam).  The outer DCN axis is folded
    into DATA_AXIS: callers see the same (data, model) axis names as
    :func:`make_mesh`.

    By default the per-device slice index comes from the platform
    (``mesh_utils.create_hybrid_device_mesh``).  Pass explicit ``devices``
    + ``slice_ids`` to build the same layout from a hand-specified topology
    (testing on fake devices, or platforms without slice attributes).
    """
    if (devices is None) != (slice_ids is None):
        raise ValueError("pass both devices and slice_ids, or neither")
    if devices is not None:
        return Mesh(
            _hybrid_grid_from_slices(devices, slice_ids, dcn_data_parallel,
                                     ici_data_parallel, model_parallel),
            (DATA_AXIS, MODEL_AXIS))

    from jax.experimental import mesh_utils

    n = len(jax.devices())
    per_slice = n // dcn_data_parallel
    if ici_data_parallel == -1:
        ici_data_parallel = per_slice // model_parallel
    grid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(ici_data_parallel, model_parallel),
        dcn_mesh_shape=(dcn_data_parallel, 1),
    )
    grid = grid.reshape(dcn_data_parallel * ici_data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _hybrid_grid_from_slices(devices, slice_ids, dcn_data_parallel,
                             ici_data_parallel, model_parallel):
    """(data, model) grid with slice-locality: slice s owns the contiguous
    data-axis rows [s * ici_dp, (s+1) * ici_dp)."""
    devices = list(devices)
    slice_ids = list(slice_ids)
    if len(devices) != len(slice_ids):
        raise ValueError(
            f"{len(devices)} devices but {len(slice_ids)} slice_ids")
    groups: dict = {}
    for d, s in zip(devices, slice_ids):
        groups.setdefault(s, []).append(d)
    if len(groups) != dcn_data_parallel:
        raise ValueError(f"{len(groups)} slices found, "
                         f"dcn_data_parallel={dcn_data_parallel}")
    sizes = {len(g) for g in groups.values()}
    if len(sizes) != 1:
        raise ValueError(f"uneven slices: {sorted(sizes)}")
    per_slice = sizes.pop()
    if ici_data_parallel == -1:
        ici_data_parallel = per_slice // model_parallel
    if ici_data_parallel * model_parallel != per_slice:
        raise ValueError(
            f"slice of {per_slice} devices != ici_data_parallel"
            f"({ici_data_parallel}) x model_parallel({model_parallel})")
    rows = []
    for s in sorted(groups):
        rows.append(np.asarray(groups[s], dtype=object).reshape(
            ici_data_parallel, model_parallel))
    return np.concatenate(rows, axis=0)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
