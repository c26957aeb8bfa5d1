"""Test harness config: force JAX onto a virtual 8-device CPU platform so
sharding/all_to_all paths are exercised without real multi-chip hardware
(SURVEY.md §4.5). Must run before any jax import."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
