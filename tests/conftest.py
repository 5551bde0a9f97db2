"""Test config: run everything on a virtual 8-device CPU mesh.

Pallas TPU kernels run in interpret mode on CPU (auto-detected by
utils.platform.default_interpret); multi-chip sharding tests get 8 virtual
devices so collectives are exercised without a pod (SURVEY.md section 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to the TPU tunnel regardless of
# the env var; override it explicitly so tests always run on the CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# Plain `pytest tests/` runs ~246 interpret-mode Pallas compilations in one
# process; around test ~215 XLA's CPU compiler segfaults under the
# accumulated compilation-cache footprint (same test passes in isolation;
# tests/runner.py runs per-file subprocesses as the hard fix). Releasing
# the jit/pallas caches every N tests keeps the single-process suite under
# the crash threshold at the cost of some recompiles.
_TEST_COUNT = 0


@pytest.fixture(autouse=True)
def _periodic_jax_cache_clear():
    yield
    global _TEST_COUNT
    _TEST_COUNT += 1
    if _TEST_COUNT % 40 == 0:
        jax.clear_caches()
