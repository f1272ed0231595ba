"""Test configuration: force CPU backend with 8 virtual devices.

Tests are hardware-independent: Pallas kernels run in interpret mode on CPU,
and the multi-chip sharding tests use an 8-device virtual CPU mesh
(xla_force_host_platform_device_count), per the project build contract.

NOTE: this environment pre-imports jax (sitecustomize) with
JAX_PLATFORMS=axon, so plain env vars are too late — we must go through
jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
