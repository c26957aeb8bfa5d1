"""Test harness config: force JAX onto a virtual 8-device CPU platform so
sharding/all_to_all paths are exercised without real multi-chip hardware
(SURVEY.md §4.5), and so the suite never contends for the single TPU.

Note: this sandbox's sitecustomize registers the TPU (axon) PJRT plugin at
interpreter start and sets the jax_platforms *config* (which outranks the
JAX_PLATFORMS env var), so the override must also be config-level and must
run before any backend initialization — hence here, at conftest import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
