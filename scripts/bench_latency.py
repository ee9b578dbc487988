"""Single-scenario control-tick latency on one TPU chip.

The throughput bench (bench.py) batches scenarios; a real robot cares
about the latency of ONE planner tick (the reference claims >15 Hz on an
i7 CPU, README.md:263).  Measures the flagship problem size (T=10, 2048
points, 2 PAN iterations) at B=1 and B=8.

Round-4 methodology (docs/AXON_DISPATCH.md): wall-clock blocked timings on
the axon tunnel are either fiction (healthy mode: block_until_ready
returns at enqueue-ACK) or RPC-inflated (degraded mode: ~25 ms fixed
overhead per call).  So this artifact records TWO honest numbers per B:

* ``device_ms`` — per-tick DEVICE time from the jax profiler event stream
  (scripts/prof_util.py): the chip truth, what a locally-attached TPU
  deployment would see (plus sub-ms local dispatch).
* ``wall_readback_ms`` p50/p90 — per-call blocked wall time WITH a
  per-tick action readback, i.e. the deployable tick latency THROUGH THIS
  TUNNEL (degraded mode; a real robot reads the action every tick).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench import (default_adjust, load_deployed_params, make_batch,
                   make_flagship)
from neupan_tpu.parallel import batched_init_state, batched_planner_step
from scripts.prof_util import device_profile

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _step_carry(spec, B, params, G, h, adjust):
    P = spec.dune_max_num

    def step_fn(carry):
        key, nom_s, nom_u, ref_s, ref_us, vels, mask, state = carry
        key, sub = jax.random.split(key)
        pts = jax.random.uniform(sub, (B, 2, P), jnp.float32, 1.0, 9.0)
        out = batched_planner_step(spec, params, G, h, adjust, nom_s, nom_u,
                                   ref_s, ref_us, pts, vels, mask, state)
        return (key, nom_s, nom_u, ref_s, ref_us, vels, mask, out.state), out

    step = jax.jit(lambda c: step_fn(c)[0])
    step_out = jax.jit(step_fn)
    nom_s, nom_u, ref_s, ref_us, _, vels, mask = make_batch(spec, B)
    state = batched_init_state(spec, B)
    carry = (jax.random.PRNGKey(0), nom_s, nom_u, ref_s, ref_us, vels, mask,
             state)
    return step, step_out, carry


def measure(B, iters=50):
    spec = make_flagship()
    G = jnp.asarray(spec.robot.G, jnp.float32)
    h = jnp.asarray(spec.robot.h, jnp.float32)
    params = load_deployed_params(spec)
    adjust = default_adjust()
    step, step_out, carry = _step_carry(spec, B, params, G, h, adjust)

    # 1. chip truth: per-tick device time from the profiler (no reads yet)
    device_ms, _ = device_profile(step, carry, n=10)

    # 2. deployable-through-tunnel: blocked wall WITH per-tick readback
    carry, out = step_out(carry)
    _ = np.asarray(out.opt_u)          # enter degraded mode before timing
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        carry, out = step_out(carry)
        _ = np.asarray(out.opt_u[..., 0])    # the action, like a robot
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts) * 1e3
    return {
        "B": B,
        "device_ms": round(float(device_ms), 3),
        "device_hz": round(1e3 / float(device_ms), 1),
        "wall_readback_p50_ms": round(float(np.percentile(ts, 50)), 3),
        "wall_readback_p90_ms": round(float(np.percentile(ts, 90)), 3),
        "wall_readback_hz_p50": round(1e3 / float(np.percentile(ts, 50)), 1),
    }


def main():
    rows = [measure(B) for B in (1, 8)]
    rec = {
        "metric": "neupan_tick_latency_T10_2kpts",
        "config": "library default (ADMMConfig(), deployed encoder), "
                  "on-device points",
        "backend": jax.default_backend(),
        "rows": rows,
        "note": "device_ms = profiler device time (chip truth; what a "
                "locally-attached deployment sees). wall_readback = blocked "
                "wall incl. per-tick D2H through the axon tunnel's degraded "
                "RPC mode (docs/AXON_DISPATCH.md).",
    }
    for r in rows:
        print(json.dumps(dict(r)))
    out = os.path.join(REPO, "BENCH_LATENCY.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
