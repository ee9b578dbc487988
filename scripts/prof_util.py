"""Trustworthy TPU timing via jax.profiler device events.

Timing through the axon tunnel is a minefield (docs/AXON_DISPATCH.md):
``block_until_ready`` returns at enqueue-ACK in the healthy dispatch mode
(wall timings are fiction), per-call blocked timings in the degraded mode
include ~2-25 ms of RPC overhead, and the first device->host read after a
healthy-mode session pays a ~4 s one-time drain.  The profiler's
device-side event stream is the only per-op ground truth: this module runs
a callable N chained times under ``jax.profiler.trace`` and aggregates the
per-op device durations.

Usage:
    from scripts.prof_util import device_profile
    per_call_ms, top_ops = device_profile(lambda x: f(x), x0, n=10)
"""
import collections
import glob
import gzip
import json
import os
import tempfile

import jax


def _parse_trace(logdir):
    files = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        raise RuntimeError(f"no trace file under {logdir}")
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    durs = collections.defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            durs[e.get("name", "?")] += e.get("dur", 0)  # microseconds
    return durs


def device_profile(step, carry, n=10, top=12, logdir=None):
    """Run ``carry = step(carry)`` n times under the profiler.

    ``step`` must be a jitted callable taking and returning a pytree so the
    calls chain (defeats any enqueue/dedup games).  Returns
    (total_device_ms_per_call, [(op_name, ms_per_call), ...]) where the
    total is the sum over the profiled jit executable's device events.
    """
    carry = step(carry)
    jax.block_until_ready(carry)
    logdir = logdir or tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(logdir):
        for _ in range(n):
            carry = step(carry)
        jax.block_until_ready(carry)
    durs = _parse_trace(logdir)
    # the outermost jit event (name starts with "jit_") double-counts its
    # children; report it as the per-call total and the children as detail
    jits = {k: v for k, v in durs.items() if k.startswith("jit_")}
    total_us = sum(jits.values())
    detail = sorted(((k, v / n / 1e3) for k, v in durs.items()
                     if not k.startswith("jit_")), key=lambda kv: -kv[1])
    return total_us / n / 1e3, detail[:top]
