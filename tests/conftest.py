"""Test configuration: run everything on a simulated 8-device CPU mesh.

The container pins JAX_PLATFORMS=axon (TPU tunnel); tests must run on CPU
with 8 virtual devices for mesh testing, so force it via jax.config before
any test module imports jax.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session", autouse=True)
def _check_cpu():
    assert jax.default_backend() == "cpu", "tests must run on the CPU mesh"
    assert len(jax.devices()) >= 8, "need 8 virtual CPU devices for mesh tests"
