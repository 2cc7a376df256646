"""Hybrid (DCN x ICI) mesh: layout invariants + a real computation on it.

The 8 fake CPU devices act as 2 slices x 4 chips via explicit slice_ids
(fake devices carry no slice attributes; the injected-topology path builds
the same layout ``mesh_utils.create_hybrid_device_mesh`` would).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from msa_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_hybrid_mesh

SLICE_IDS = [0, 0, 0, 0, 1, 1, 1, 1]


def two_slice_mesh(model_parallel=2):
    return make_hybrid_mesh(dcn_data_parallel=2,
                            model_parallel=model_parallel,
                            devices=jax.devices()[:8], slice_ids=SLICE_IDS)


def test_hybrid_mesh_shape_and_slice_locality():
    mesh = two_slice_mesh()
    assert mesh.shape == {"data": 4, "model": 2}
    assert mesh.devices.size == 8
    slice_of = {d: s for d, s in zip(jax.devices()[:8], SLICE_IDS)}
    grid = mesh.devices
    # every model-axis group lives inside ONE slice (its collectives ride ICI)
    for row in grid:
        assert len({slice_of[d] for d in row}) == 1
    # slices own contiguous data-axis blocks: only the outer fold crosses DCN
    assert [slice_of[d] for d in grid[:, 0]] == [0, 0, 1, 1]


def test_hybrid_mesh_mp1_and_explicit_ici():
    mesh = make_hybrid_mesh(dcn_data_parallel=2, ici_data_parallel=4,
                            model_parallel=1, devices=jax.devices()[:8],
                            slice_ids=SLICE_IDS)
    assert mesh.shape == {"data": 8, "model": 1}


def test_hybrid_mesh_rejects_bad_topologies():
    devs = jax.devices()[:8]
    with pytest.raises(ValueError, match="slices found"):
        make_hybrid_mesh(dcn_data_parallel=4, model_parallel=2,
                         devices=devs, slice_ids=SLICE_IDS)
    with pytest.raises(ValueError, match="uneven"):
        make_hybrid_mesh(dcn_data_parallel=2, model_parallel=1,
                         devices=devs, slice_ids=[0, 0, 0, 1, 1, 1, 1, 1])
    with pytest.raises(ValueError, match="pass both"):
        make_hybrid_mesh(dcn_data_parallel=2, devices=devs)


def test_gradient_psum_runs_on_hybrid_mesh():
    """The dp psum (the one collective that crosses DCN) executes and
    reduces correctly over all 8 devices of the 2-slice mesh."""
    mesh = two_slice_mesh()
    x = jnp.arange(8.0).reshape(4, 2)  # one row per data shard
    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS)))

    @jax.jit
    def grad_sum(x):
        return jax.shard_map(
            lambda v: jax.lax.psum(v, DATA_AXIS),
            mesh=mesh,
            in_specs=P(DATA_AXIS, MODEL_AXIS),
            out_specs=P(None, MODEL_AXIS))(x)

    out = np.asarray(jax.device_get(grad_sum(xs)))
    np.testing.assert_allclose(out[0], [0 + 2 + 4 + 6, 1 + 3 + 5 + 7])
