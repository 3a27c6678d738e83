"""Test configuration: force an 8-device virtual CPU platform so
mesh/pjit/shard_map tests run without TPU hardware (SURVEY.md §4.3).

NOTE: this environment PRELOADS jax at interpreter startup (axon TPU
integration), so env vars like JAX_PLATFORMS set here are already too late
for jax's import-time reads — use jax.config.update instead (works until
the first backend initialization)."""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent XLA compilation cache: compiles dominate test wall-clock on a
# single-core CPU host; repeat runs hit the cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/drtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def mesh8():
    """8-way data mesh over the virtual CPU devices."""
    from domainrag_tpu.parallel import mesh as mesh_mod
    return mesh_mod.create_mesh(model_parallel=1)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU platform, got "
        f"{jax.default_backend()}")
    assert len(jax.devices()) == 8
