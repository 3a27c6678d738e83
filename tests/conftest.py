"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
imports, so mesh/pjit/shard_map tests run without TPU hardware
(SURVEY.md §4.3)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent XLA compilation cache: compiles dominate test wall-clock on a
# single-core CPU host; repeat runs hit the cache.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/drtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
