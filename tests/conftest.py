"""Test configuration: force CPU backend with 8 virtual devices.

The multi-device tests exercise real GSPMD shardings on a fake 8-device mesh
(the JAX-native equivalent of a fake distributed backend — SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compilation cache: repeat test runs skip XLA recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

# The image's axon plugin force-registers the TPU platform regardless of
# JAX_PLATFORMS; override via the config API before any backend init.
jax.config.update("jax_platforms", "cpu")
# This jax build also ignores the JAX_COMPILATION_CACHE_DIR env var (verified
# r2: config stays None, "cache is disabled/not initialized") — only the
# config API enables the persistent cache that makes repeat runs skip the
# minutes-long train-step XLA compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1990)
