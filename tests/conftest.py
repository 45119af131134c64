"""Test configuration: run everything on a virtual 8-device CPU mesh.

The multi-host fake-backend pattern the reference lacks (SURVEY.md §4): CPU
execution with ``--xla_force_host_platform_device_count=8`` lets the sharding
tests validate real ``Mesh``/``shard_map`` programs without TPU hardware.
Must run before the first jax backend use; the environment pins
``JAX_PLATFORMS=axon`` (TPU-over-tunnel), so we override in-process.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
