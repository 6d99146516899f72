"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md par.4: multi-host tests on a single host).

The harness environment pre-registers the axon TPU backend from
sitecustomize (before any conftest code runs), so setting JAX_PLATFORMS in
os.environ here is too late — jax is already imported. Backends initialize
lazily though, so `jax.config.update` still wins as long as no computation
has run yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the sharded/grad graphs take minutes to compile;
# cached across runs they load in seconds
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
