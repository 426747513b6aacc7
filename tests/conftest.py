"""Test environment: force an 8-device virtual CPU mesh.

jax is pre-imported by the host's sitecustomize with JAX_PLATFORMS=axon (a
tunneled TPU with per-op network dispatch), so the platform must be overridden
through jax.config *before the backend initializes* — setting the env var here
is too late. A persistent compilation cache keeps repeated test runs fast on
the single-core host.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# MGAR_TEST_CACHE overrides the cache location. The persistent cache is keyed
# by program, NOT by host CPU features: executables AOT-compiled on a
# different machine deserialize here with a "Target machine feature ... not
# supported" warning and subtly different codegen — which can make a cached
# program and a freshly compiled one numerically different at the ulp level
# (observed: deterministic 2e-3 Adam-step divergence in the multichip
# agreement test when one side hit a stale cross-machine cache). Point this
# somewhere fresh when numerics matter more than compile time.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MGAR_TEST_CACHE",
                                 "/root/.cache/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running overfit/convergence tests")
