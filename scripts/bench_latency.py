"""Single-scenario control-tick latency on one TPU chip.

The throughput bench (bench.py) batches scenarios; a real robot cares
about the latency of ONE planner tick (the reference claims >15 Hz on an
i7 CPU, README.md:263).  Measures the jitted full PAN step at B=1 with the
flagship problem size (T=10, 2048 points, 2 PAN iterations), p50/p90 over
repeated calls.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench import make_batch, make_flagship
from neupan_tpu.models import obs_point_net
from neupan_tpu.ops.nrmp import AdjustParams
from neupan_tpu.parallel import batched_init_state, batched_planner_step

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(B, iters=50):
    spec = make_flagship()
    G = jnp.asarray(spec.robot.G, jnp.float32)
    h = jnp.asarray(spec.robot.h, jnp.float32)
    # the DEPLOYED self-trained encoder (advisor round-2 finding: a
    # latency artifact on a random-init encoder benches a model nobody
    # ships) — same loading rule as bench.py
    ckpt = os.path.join(REPO, "examples/model/diff_robot_default/model.npz")
    if os.path.exists(ckpt):
        params = obs_point_net.load_checkpoint(ckpt)
    else:
        params = obs_point_net.init_params(jax.random.PRNGKey(0), 2,
                                           spec.robot.edge_dim)
    adjust = AdjustParams(q_s=jnp.asarray(1.0), p_u=jnp.asarray(1.0),
                          eta=jnp.asarray(10.0), d_max=jnp.asarray(1.0),
                          d_min=jnp.asarray(0.1))
    step = jax.jit(lambda *a: batched_planner_step(spec, params, G, h,
                                                   adjust, *a))
    args = make_batch(spec, B)
    state = batched_init_state(spec, B)
    out = step(*args, state)
    jax.block_until_ready(out)

    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = step(*args, out.state)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts) * 1e3
    return {
        "B": B,
        "p50_ms": round(float(np.percentile(ts, 50)), 3),
        "p90_ms": round(float(np.percentile(ts, 90)), 3),
        "hz_p50": round(1e3 / float(np.percentile(ts, 50)), 1),
    }


def main():
    rows = [measure(B) for B in (1, 8)]
    rec = {
        "metric": "neupan_tick_latency_T10_2kpts",
        "config": "library default (ADMMConfig(), deployed encoder)",
        "backend": jax.default_backend(),
        "rows": rows,
    }
    for r in rows:
        print(json.dumps(dict(r)))
    out = os.path.join(REPO, "BENCH_LATENCY.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
