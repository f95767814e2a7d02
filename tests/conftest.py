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
# The path is keyed by the host's CPU feature set: XLA:CPU AOT entries baked
# under different features SIGABRT the interpreter when loaded on a host
# without them (observed twice across VM migrations — cpu_aot_loader
# "machine feature not supported" warnings are the tell).


def _cpu_feature_tag() -> str:
    # Key on model name + family/stepping + flags: hosts with identical
    # /proc/cpuinfo flags can still differ in what LLVM's -mcpu=native
    # emits (observed: an AOT entry built under one VM host SIGABRTed on a
    # flags-identical successor), so the flags hash alone is not enough.
    import hashlib

    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("model name", "cpu family", "model", "stepping"):
                    parts.append(line.strip())
                elif key == "flags":
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                if line.startswith("power management"):
                    break  # first core only
    except OSError:
        pass
    if not parts:
        return "nofeat"
    return hashlib.sha1("|".join(sorted(set(parts))).encode()).hexdigest()[:10]


_CACHE_DIR = os.environ.get(
    "LCRNET_JAX_CACHE", f"/tmp/lcrnet_jax_cache_{_cpu_feature_tag()}"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

# Subprocess CLIs (tests/test_cli_end_to_end.py spawns experiment scripts)
# read these from the environment — without them every CLI test recompiles
# its model programs from scratch (measured: 58 s for preextract alone).
os.environ["JAX_COMPILATION_CACHE_DIR"] = _CACHE_DIR
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
os.environ["JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES"] = "all"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(7351)


@pytest.fixture(scope="session")
def shared_test_params():
    """One `init_params(make_test_cfg())` for the whole session.

    The jitted init of the full model costs ~20 s on CPU; several modules
    (checkpoint, model, engine) only need *a* valid parameter tree, not a
    private one — jax arrays are immutable, so sharing is safe."""
    from lcrnet_tpu.config import make_test_cfg
    from lcrnet_tpu.pipeline import init_params

    return init_params(make_test_cfg())
