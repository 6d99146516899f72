"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md par.4: multi-host tests on a single host).

The harness environment pre-registers the axon TPU backend from
sitecustomize (before any conftest code runs), so setting JAX_PLATFORMS in
os.environ here is too late — jax is already imported. Backends initialize
lazily though, so `jax.config.update` still wins as long as no computation
has run yet.
"""
import os

_TPU_MODE = os.environ.get("YAF_TPU_TESTS", "0") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_MODE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not _TPU_MODE:
    # default: virtual 8-device CPU mesh (sharding tests without hardware)
    jax.config.update("jax_platforms", "cpu")
# YAF_TPU_TESTS=1 keeps the real backend: the @pytest.mark.tpu on-hardware
# kernel suite (tests/test_tpu_hw.py) runs Mosaic-compiled Pallas kernels
# against the oracle on the live chip — the fault class interpret-mode CI
# cannot catch (round-3 device fault)
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
