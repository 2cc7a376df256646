"""The driver imports __graft_entry__ and calls dryrun_multichip(n) directly,
under the host's platform preset — NOT via ``python __graft_entry__.py``.
Round-1 failed exactly this invocation (MULTICHIP_r01.json ok=false): the
CPU/fake-device setup lived only under the ``__main__`` guard.  Pin the
driver's calling convention here.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_invocation():
    env = dict(os.environ)
    # Simulate the driver host: the axon TPU platform preset is in the
    # environment.  dryrun_multichip must force the virtual-CPU platform
    # itself, before any backend initializes (never touching the preset
    # platform), so this runs without TPU access.
    env["JAX_PLATFORMS"] = "axon"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-3000:]}"
    assert "dryrun_multichip ok" in proc.stdout
    # round 5: the dryrun's second step must exercise the Pallas kernel
    # dispatch under TP (head-parallel shard_map, interpret mode)
    assert "kernel_step(head-parallel short_attention" in proc.stdout


def test_ensure_cpu_devices_with_live_backend():
    """If a backend is already initialized (as in this pytest process),
    _ensure_cpu_devices must still deliver n CPU devices."""
    sys.path.insert(0, REPO)
    try:
        from __graft_entry__ import _ensure_cpu_devices
    finally:
        sys.path.remove(REPO)
    devs = _ensure_cpu_devices(8)
    assert len(devs) >= 8
    assert all(d.platform == "cpu" for d in devs[:8])
