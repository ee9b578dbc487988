"""neupan_tpu — a TPU-native NeuPAN motion-planning engine.

Brand-new implementation, in JAX/XLA/Pallas, of the capabilities of the
reference NeuPAN planner (hanruihua/NeuPAN): a real-time, map-free, MPC-based
planner mapping raw 2-D obstacle points to control actions through an
alternating minimization between a learned point encoder (DUNE) and a convex
motion-planning QP (NRMP).

Key differences from the reference (all TPU-first):
  * the entire control step is one jitted function with static shapes;
  * NRMP is a hand-written batched OSQP-style ADMM solver (ops/qp.py)
    instead of cvxpy/cvxpylayers/ECOS;
  * DUNE runs as batched XLA / Pallas kernels over padded point sets;
  * thousands of independent planning scenarios batch/shard across chips
    via vmap + shard_map (parallel/).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Honor JAX_PLATFORMS even when jax was already imported before the caller
# could set it: site hooks (e.g. a TPU-tunnel sitecustomize) import jax at
# interpreter startup, which latches the env var into jax.config — a script
# that then sets os.environ["JAX_PLATFORMS"] and imports this library would
# silently run on the wrong backend (observed: "cpu" sweeps executing over
# the TPU tunnel, 10x slower and with different fp behavior).  Backends are
# not initialized until first use, so syncing the config here is safe.
_env_platforms = _os.environ.get("JAX_PLATFORMS")
if _env_platforms and _jax.config.jax_platforms != _env_platforms:
    try:
        _jax.config.update("jax_platforms", _env_platforms)
    except Exception:
        pass

# Persistent compilation cache (opt-out via NEUPAN_TPU_NO_CACHE=1): the
# planner step is one large jitted graph; caching makes warm process starts
# near-instant on both CPU and TPU.  The directory is keyed by the host
# CPU's feature flags: XLA:CPU AOT cache entries record the *compiling*
# machine's features and XLA will load an entry compiled on a different
# machine (e.g. through a remote-compile tunnel), silently changing
# numerics between cached and fresh runs.
def _machine_cache_key() -> str:
    try:
        with open("/proc/cpuinfo") as _f:
            for _line in _f:
                if _line.startswith("flags"):
                    import hashlib as _hashlib
                    return _hashlib.sha1(_line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform as _platform
    return _platform.machine()


if not _os.environ.get("NEUPAN_TPU_NO_CACHE"):
    # The local cpuinfo key alone is NOT enough: a process whose backend is
    # a remote-compile tunnel (e.g. JAX_PLATFORMS=axon) runs on this host
    # but compiles its XLA:CPU executables on the tunnel server, whose CPU
    # features differ — those entries land in the same dir and later LOCAL
    # cpu runs load them (XLA loads AOT results across machine-feature
    # mismatches with only a warning), silently changing numerics and
    # flipping chaotic closed-loop outcomes.  Segregate by platform tag.
    _platform_tag = (_os.environ.get("JAX_PLATFORMS") or "default").replace(
        ",", "-")
    # ... and even JAX_PLATFORMS=cpu is not enough on hosts with a
    # remote-compile site hook (the axon sitecustomize routes XLA compiles
    # through the tunnel server, whose CPU differs): a hooked cpu process
    # would poison the local cpu cache with foreign-feature AOT entries
    # (observed round 4: "+prefer-no-scatter ... could lead to SIGILL"
    # warnings in pure-local runs).  Tag hooked processes separately.
    import sys as _sys
    if any(".axon_site" in (_p or "") for _p in _sys.path):
        _platform_tag += "-tunnelhook"
    _cache_dir = _os.environ.get(
        "NEUPAN_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache",
                      f"neupan_tpu_jax_{_machine_cache_key()}_{_platform_tag}"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass

from neupan_tpu.robot import Robot  # noqa: F401
