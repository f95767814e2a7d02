"""Test configuration: force an 8-device virtual CPU platform.

Multi-device sharding tests run on a virtual CPU mesh — this is how the TPU
build tests "multi-chip" without a pod (the reference cannot test its DDP
path at all without GPUs; SURVEY.md §4).
"""

import os

# Force override: the environment may pin JAX_PLATFORMS to a TPU plugin via
# sitecustomize; tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite compiles several full-model
# programs (~minutes each on CPU); repeat runs hit the disk cache instead.
_CACHE_DIR = os.environ.get("LCRNET_JAX_CACHE", "/tmp/lcrnet_jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(7351)
