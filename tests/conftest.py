"""Test environment: force an 8-device virtual CPU mesh so sharded code
paths are exercised without TPU hardware (SURVEY.md §4 test strategy)."""

import os

# Must run before jax initializes its backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the environment's TPU plugin overrides JAX_PLATFORMS programmatically;
# counter-force CPU before any backend use
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: dedupes identical pipeline HLO across
# tests within a run (different jitted lambdas, same graph) and makes
# repeat runs compile-free — the suite is XLA-compile-bound on this
# single-core CPU
jax.config.update("jax_compilation_cache_dir", "/tmp/mfsr_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
