"""Find the first corridor/diff control step where iters=150 and iters=300
solves diverge, and dissect that QP: polish selection, KKT errors, oracle.

Round-3 diagnosis of the 300-iteration pin (BASELINE.md round-2 record).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import yaml  # noqa: E402

from neupan_tpu.planner import NeuPan  # noqa: E402
from neupan_tpu.sim.env_loader import load_env  # noqa: E402
from scripts.exp_corridor_iters import _kwargs  # noqa: E402


def make(iters, **admm_extra):
    base = os.path.join(REPO, "examples/corridor/diff")
    with open(os.path.join(base, "planner.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg.setdefault("pan", {})["admm"] = dict({"iters": iters}, **admm_extra)
    return NeuPan(**_kwargs(cfg)), base


def main(max_steps=220):
    pl_hi, base = make(300)
    pl_lo, _ = make(150)
    env = load_env(os.path.join(base, "env.yaml"), pl_hi.robot)

    first_div = None
    for i in range(max_steps):
        state = env.get_robot_state()
        pts = pl_hi.scan_to_point(state, env.get_lidar_scan())
        a_hi, info = pl_hi(state, pts)
        a_lo, _ = pl_lo(state, pts)
        d = float(np.abs(a_hi - a_lo).max())
        if d > 1e-3 and first_div is None:
            first_div = i
            print(f"step {i}: pos=({state[0,0]:.2f},{state[1,0]:.2f}) "
                  f"a_hi={a_hi.ravel()} a_lo={a_lo.ravel()} max|da|={d:.4f}")
        if i % 10 == 0:
            print(f"step {i:3d}: max|da|={d:.2e} "
                  f"pos=({state[0,0]:.2f},{state[1,0]:.2f}) "
                  f"min_d={pl_hi.min_distance:.3f}", flush=True)
        if info["arrive"]:
            break
        env.step(a_hi)
    print(f"first divergence >1e-3 at step {first_div}")


if __name__ == "__main__":
    main()
