"""Test harness: CPU backend with an 8-device virtual mesh.

Set before any jax import so multi-device sharding tests run anywhere
(the reference could not test its multi-GPU path without >=2 physical GPUs,
reference tests/unit/test_gpu_acceleration.py:476-517 — we can).
"""

import os

# Force CPU even when the session env points at a TPU (JAX_PLATFORMS=axon):
# unit tests must see the 8-device virtual mesh; the real chip is for bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize (axon TPU tunnel) forces
# jax_platforms='axon,cpu' regardless of JAX_PLATFORMS; override it so the
# suite really runs on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# NOTE: no persistent compilation cache. This host can migrate mid-session,
# and stale XLA:CPU AOT entries compiled for the previous machine's
# instruction set caused random SIGSEGV/SIGILL at cache-hit sites (the
# loader warns "machine feature +prefer-no-scatter is not supported ...
# could lead to execution errors such as SIGILL"). In-process compilation
# always targets the current host.


# Tolerances per working precision (reference tests/__init__.py:27-35)
TEST_CONFIG = {
    "tolerance_fp32": 1e-5,
    "tolerance_fp64": 1e-10,
    "tolerance_mixed": 1e-8,
    "grid_ladder": [17, 33, 65],
}


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound the number of live compiled XLA:CPU executables.

    Single-process full-suite runs intermittently segfaulted inside XLA:CPU
    dispatch once ~130 jitted programs had accumulated (sites varied between
    runs; every test passes in smaller batches). Dropping the compilation
    caches at module boundaries keeps the executable population small. Costs
    recompiles of shared graphs across modules (~1.3x wall time)."""
    yield
    jax.clear_caches()
