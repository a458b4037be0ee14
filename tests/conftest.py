"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host devices (the XLA SPMD partitioner is platform-agnostic).

NB: this environment boots an `axon` TPU PJRT plugin from sitecustomize and
prepends it to ``jax_platforms`` — the env var JAX_PLATFORMS is NOT enough
to avoid it; we must override the jax config after import (before any jax
computation).  Tests must run on CPU: the tunneled single TPU makes compiles
minutes-slow and wedges when torch initializes OpenMP first.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound process-cumulative compiled-program state.

    The full suite compiles thousands of XLA programs in one process;
    late fresh compiles (vocoder train steps) segfaulted inside
    backend_compile reproducibly at ~the same point in three full-suite
    runs while always passing in isolation.  Dropping compiled
    executables between modules keeps the process far from whatever
    resource the compiler exhausts; modules re-warm their own jits."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
