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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    A full-suite process accumulates ~hundreds of XLA CPU executables;
    late compiles then segfault inside XLA (reproducibly around test
    ~#110, always in whatever test compiles next — the same compile is
    clean standalone or in any isolated tail run).  Dropping the jit
    caches at module boundaries keeps the process well inside whatever
    resource the crash exhausts; cross-module cache reuse is minimal
    anyway (different shapes per module).
    """
    yield
    jax.clear_caches()
