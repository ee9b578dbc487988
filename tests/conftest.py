"""Test configuration: force an 8-device virtual CPU mesh before jax loads.

All unit/integration tests run on CPU (fast, deterministic, no TPU
contention); multi-device sharding tests use the 8 virtual host devices.
"""

import os

# Force CPU: the ambient environment may point JAX at a tunneled TPU
# (JAX_PLATFORMS=axon), which is slow and contended for unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# Env vars alone are not enough: pytest plugins (jaxtyping/typeguard) import
# jax before this conftest runs, latching the ambient JAX_PLATFORMS=axon
# (tunneled TPU).  Force the CPU backend through the config API, which works
# post-import.
jax.config.update("jax_platforms", "cpu")

# This host has AMX/AVX512-BF16; XLA CPU can silently lower f32 matmuls to
# bf16 fast paths, which breaks numeric tests nondeterministically.  Force
# exact f32 matmuls for the whole suite.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: jit compiles dominate test wall-clock here.
# Key the cache dir by the host CPU: XLA:CPU AOT results encode machine
# features (AMX/AVX512 etc.) and XLA will load a cache entry compiled on a
# different machine anyway, changing numerics between pytest (cache hit)
# and standalone (fresh compile) runs.
import hashlib
import platform


def _machine_key():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return platform.machine()


jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_test_cache_{_machine_key()}")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
