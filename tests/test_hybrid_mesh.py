"""Hybrid (DCN x ICI) mesh construction on fake devices."""

import jax
import pytest

from msa_tpu.parallel.mesh import make_hybrid_mesh


def test_hybrid_mesh_shape():
    # 8 fake CPU devices = "2 slices" x 4 chips.
    try:
        mesh = make_hybrid_mesh(dcn_data_parallel=2, model_parallel=2)
    except Exception as e:  # fake CPU devices may lack slice metadata
        pytest.skip(f"hybrid mesh unavailable on fake devices: {e}")
    assert mesh.shape == {"data": 4, "model": 2}
    assert mesh.devices.size == 8
