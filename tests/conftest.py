"""Test harness config: force JAX onto a virtual 8-device CPU platform so
sharding/all_to_all paths are exercised without real multi-chip hardware
(SURVEY.md §4.5), and so the suite never contends for the single TPU.

Note: this sandbox's sitecustomize registers the TPU (axon) PJRT plugin at
interpreter start and sets the jax_platforms *config* (which outranks the
JAX_PLATFORMS env var), so the override must also be config-level and must
run before any backend initialization — hence here, at conftest import.

Real-TPU lane: `GENOME_TPU_REAL=1 python -m pytest tests -m tpu` keeps the
TPU backend and runs only the `tpu`-marked tests (Mosaic codegen checks for
the Pallas kernels — interpret mode can diverge from compiled code, so the
hardest kernel branches are re-verified on the chip). Without the env var,
`tpu`-marked tests are skipped and everything else runs on the CPU mesh.
"""

import os

import pytest

_REAL_TPU = os.environ.get("GENOME_TPU_REAL", "") == "1"

if not _REAL_TPU:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _REAL_TPU:
    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    on_tpu = _REAL_TPU and jax.devices()[0].platform == "tpu"
    skip_tpu = pytest.mark.skip(
        reason="needs the real TPU (GENOME_TPU_REAL=1 -m tpu)")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled-executable and tracing caches between test modules.

    The full suite compiles many hundreds of XLA:CPU programs in one
    process; past ~90% of the suite the CPU compiler intermittently
    segfaulted inside backend_compile_and_load (observed twice at
    test_walk_ladder after the round-4 tests grew the program count —
    the same test passes 3/3 standalone). Dropping dead executables at
    module boundaries keeps the per-process compiler state bounded; the
    cost is re-compiling the few fixtures shared across modules."""
    yield
    jax.clear_caches()
