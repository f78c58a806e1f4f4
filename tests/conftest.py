"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so data-parallel/sharding
logic is exercised without TPU hardware (SURVEY.md §4: multi-host tests
via xla_force_host_platform_device_count).  Env vars alone are not
enough: jax may already be imported by a pytest plugin, which latches
JAX_PLATFORMS at import time — so we also force the config directly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
