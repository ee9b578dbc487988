"""Scenario-parallel scaling-efficiency harness.

Measures full-planner solves/s vs device count over a ``jax.sharding.Mesh``
(scenario axis on ICI), reporting per-device throughput and scaling
efficiency relative to 1 device.  Writes ``BENCH_SCALING.json`` at the repo
root (BASELINE.json asks for throughput measured at 1 chip / 1 host /
>= 2 hosts).

Modes:
  * default: run on whatever devices the backend exposes.  Under
    ``JAX_PLATFORMS=cpu`` + ``--xla_force_host_platform_device_count=8``
    this exercises the real shard_map path on an 8-device virtual mesh
    (numbers are CPU-relative, the SCALING CURVE is the product).  On a TPU
    pod slice it measures real chips over ICI.
  * --multiprocess: initialize ``jax.distributed`` first (coordinator/rank
    from the standard env vars or flags), then run the same mesh measurement
    over all processes' devices — the >= 2-host (DCN) path is this flag on
    each host.

Usage:
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py
    python scripts/bench_scaling.py --multiprocess \
        --coordinator 10.0.0.1:1234 --num-processes 2 --process-id $RANK
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-device", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--admm-iters", type=int, default=None,
                    help="override ADMM iterations (default: planner default)")
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--multiprocess", action="store_true")
    ap.add_argument("--coordinator", type=str,
                    default=os.environ.get("JAX_COORDINATOR", ""))
    ap.add_argument("--num-processes", type=int,
                    default=int(os.environ.get("JAX_NUM_PROCESSES", "1")))
    ap.add_argument("--process-id", type=int,
                    default=int(os.environ.get("JAX_PROCESS_ID", "0")))
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "BENCH_SCALING.json"))
    ap.add_argument("--baseline", type=str, default="",
                    help="single-process BENCH_SCALING.json to compute "
                         "efficiency against (multiprocess runs measure "
                         "only the global mesh)")
    args = ap.parse_args()

    import jax

    if args.multiprocess:
        # DCN-ready path: one flag per host turns the single-host harness
        # into a multi-process (>= 2 hosts) measurement.
        jax.distributed.initialize(
            coordinator_address=args.coordinator or None,
            num_processes=args.num_processes,
            process_id=args.process_id)

    import jax.numpy as jnp
    import numpy as np

    import bench as bench_mod
    from neupan_tpu.parallel import (batched_init_state, make_mesh,
                                     sharded_planner_step)
    from neupan_tpu.models import obs_point_net
    from neupan_tpu.ops.nrmp import AdjustParams

    spec_kwargs = {}
    if args.admm_iters is not None:
        spec_kwargs["admm_iters"] = args.admm_iters
    spec = bench_mod.make_flagship(P=args.points, **spec_kwargs)
    G = jnp.asarray(spec.robot.G, jnp.float32)
    h = jnp.asarray(spec.robot.h, jnp.float32)
    ckpt = os.path.join(REPO, "examples/model/diff_robot_default/model.npz")
    params = obs_point_net.load_checkpoint(ckpt)
    adjust = AdjustParams(q_s=jnp.asarray(1.0), p_u=jnp.asarray(1.0),
                          eta=jnp.asarray(10.0), d_max=jnp.asarray(1.0),
                          d_min=jnp.asarray(0.1))

    devices = jax.devices()
    if args.multiprocess:
        # Multi-controller mode: only the GLOBAL mesh is measurable — a
        # sub-mesh excluding some process's devices cannot be executed by
        # that process (its jit would own no shard; observed segfault on
        # the CPU backend).  Efficiency vs 1 device comes from comparing
        # against the single-process run's table.
        counts = [len(devices)]
    else:
        counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
        if len(devices) not in counts:
            counts.append(len(devices))

    from jax.sharding import NamedSharding, PartitionSpec as PSpec

    def globalize(tree, mesh):
        """Per-process local batch -> global jax.Arrays sharded on axis 0.

        Single-process: identity (jit shards host arrays itself).  Multi-
        process: every input must be a global array assembled from each
        process's local shard (host-local numpy into a sharded jit is not
        addressable across controllers)."""
        if not args.multiprocess:
            return tree

        def one(x):
            x = np.asarray(x)
            sh = NamedSharding(mesh, PSpec("scenario"))
            return jax.make_array_from_process_local_data(sh, x)

        return jax.tree.map(one, tree)

    rows = []
    for n in counts:
        mesh = make_mesh(n)
        local_B = args.batch_per_device * (jax.local_device_count()
                                           if args.multiprocess else n)
        B = args.batch_per_device * n
        # per-stage timing so a real pod run produces a complete table
        # with zero edits (VERDICT round-2 #8): input assembly (h2d /
        # cross-host global-array construction), first-call compile, and
        # the steady-state step are separated.
        t0 = time.perf_counter()
        argsb = globalize(bench_mod.make_batch(spec, local_B,
                                               seed=jax.process_index()),
                          mesh)
        state = globalize(batched_init_state(spec, local_B), mesh)
        jax.block_until_ready((argsb, state))
        t_h2d = time.perf_counter() - t0

        # device arrays as arguments, not closure constants (captured jax
        # Arrays trip the axon degraded dispatch mode; see
        # scripts/exp_dispatch_trigger.py)
        def step(params, G, h, adjust, *a):
            return sharded_planner_step(spec, mesh, params, G, h, adjust, *a)

        step = jax.jit(step)
        t0 = time.perf_counter()
        out = step(params, G, h, adjust, *argsb, state)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(params, G, h, adjust, *argsb, out.state)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        sps = B * args.iters / dt
        rows.append(dict(devices=n, batch=B, solves_per_s=round(sps, 1),
                         per_device=round(sps / n, 1),
                         step_ms=round(dt / args.iters * 1e3, 1),
                         h2d_ms=round(t_h2d * 1e3, 1),
                         compile_s=round(t_compile, 1)))
        print(f"devices={n:2d} batch={B:5d} solves/s={sps:9.1f} "
              f"per-device={sps / n:8.1f} step={dt/args.iters*1e3:6.1f}ms "
              f"h2d={t_h2d*1e3:6.1f}ms compile={t_compile:5.1f}s",
              flush=True)

    # Efficiency: vs this run's own 1-device row, or vs a supplied
    # single-process baseline.  A single global-mesh row with no baseline
    # publishes efficiency=None — normalizing it against itself printed a
    # meaningless 1.0 that read as perfect scaling (advisor round-2).
    base = None
    if len(rows) > 1:
        base = rows[0]["per_device"]
    elif args.baseline:
        with open(args.baseline) as f:
            base_rows = json.load(f)["scaling"]
        base = base_rows[0]["per_device"]
    for r in rows:
        r["efficiency"] = (round(r["per_device"] / base, 3)
                           if base else None)

    result = dict(
        backend=jax.default_backend(),
        n_processes=jax.process_count(),
        n_devices=len(devices),
        batch_per_device=args.batch_per_device,
        points=args.points,
        admm_iters=args.admm_iters,
        scaling=rows,
    )
    if jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps({"scaling_efficiency_at_max_devices":
                          rows[-1]["efficiency"],
                          "devices": rows[-1]["devices"]}))
        if rows[-1]["efficiency"] is None:
            print("NOTE: single global-mesh row without --baseline — "
                  "efficiency unpublishable; pass --baseline "
                  "BENCH_SCALING.json from a single-process run")
    return 0


if __name__ == "__main__":
    sys.exit(main())
