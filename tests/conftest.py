"""Test config: force an 8-device virtual CPU platform so multi-chip sharding
paths (mesh + halo exchange) run without TPU hardware, as SURVEY.md §4(d)
prescribes.

Note: this container's sitecustomize imports jax and registers a TPU backend
before pytest starts, so env vars alone are too late — we must override via
jax.config before any backend is initialized (first jax.devices() call)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
assert jax.device_count() >= 8, "tests need 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
