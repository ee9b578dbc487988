"""Per-op device-time attribution of the full flagship planner step.

Runs the B=512 batched planner step (the exact program bench.py times)
under the jax profiler and prints the top device ops — the map for the
remaining optimization tail after the round-5 fused kernels.  Usage:

    python scripts/prof_full_step.py          # TPU via the ambient axon env
    BENCH_BATCH=256 python scripts/prof_full_step.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import (default_adjust, load_deployed_params, make_batch,
                   make_flagship)
from neupan_tpu.parallel import batched_init_state, batched_planner_step
from scripts.prof_util import device_profile


def main(B=512, top=40):
    spec = make_flagship()
    P = spec.dune_max_num
    G = jnp.asarray(spec.robot.G, jnp.float32)
    h = jnp.asarray(spec.robot.h, jnp.float32)
    params = load_deployed_params(spec)
    adjust = default_adjust()
    nom_s, nom_u, ref_s, ref_us, pts, vels, mask = make_batch(spec, B)
    state = batched_init_state(spec, B)

    def full_step(carry):
        key, state = carry
        key, sub = jax.random.split(key)
        pts = jax.random.uniform(sub, (B, 2, P), jnp.float32, 1.0, 9.0)
        out = batched_planner_step(
            spec, params, G, h, adjust, nom_s, nom_u, ref_s, ref_us,
            pts, vels, mask, state)
        return (key, out.state)

    t, detail = device_profile(jax.jit(full_step),
                               (jax.random.PRNGKey(0), state), n=8, top=top)
    print(f"full_step: {t:.3f} ms/call  ({B / t * 1e3:.0f} solves/s)")
    acc = 0.0
    for name, ms in detail:
        acc += ms
        print(f"  {ms:8.4f} ms  {name}")
    print(f"  ---- top-{top} sum {acc:.3f} ms")


if __name__ == "__main__":
    main(int(os.environ.get("BENCH_BATCH", "512")),
         int(os.environ.get("PROF_TOP", "40")))
