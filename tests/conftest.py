"""Test harness: force an 8-device virtual CPU mesh.

The execution image pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon
(one real TPU through a tunnel), so env vars alone are too late; the config
API still works because no backend has been initialized yet.  Multi-chip
sharding tests then run on XLA's fake host devices (the reference has no
distributed code at all; SURVEY.md section 4 makes multi-chip-on-CPU our test
strategy).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
