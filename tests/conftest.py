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


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (long-horizon e2e, ~30 min on a "
             "2-CPU box); default runs are the fast subset")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test, skipped unless --slow "
                   "(or RUN_SLOW=1) is given")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --slow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
