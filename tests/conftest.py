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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
