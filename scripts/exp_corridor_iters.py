"""Closed-loop corridor/diff outcome vs ADMM iteration budget.

Round-2 finding (BASELINE.md): per-QP optimality admits 150 iterations, but
at <=250 the robot dodges the x=10 pillar DOWN into the cul-de-sac between
pillar (y 16..21) and bottom wall (y 14..16) and deadlocks; at 300 it dodges
UP through the only real gap (y 21..24).  This experiment reproduces the
bifurcation and records where the dodge direction is decided, to ground the
round-3 formulation-level fix.

Usage: python scripts/exp_corridor_iters.py [iters ...]
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import yaml  # noqa: E402

from neupan_tpu.planner import NeuPan  # noqa: E402
from neupan_tpu.sim.env_loader import load_env  # noqa: E402


def run(iters, max_steps=400, admm_extra=None, adjust_extra=None,
        verbose=True):
    base = os.path.join(REPO, "examples/corridor/diff")
    with open(os.path.join(base, "planner.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg.setdefault("pan", {})["admm"] = dict({"iters": iters},
                                             **(admm_extra or {}))
    if adjust_extra:
        cfg.setdefault("adjust", {}).update(adjust_extra)
    planner = NeuPan(**_kwargs(cfg))
    env = load_env(os.path.join(base, "env.yaml"), planner.robot)

    traj = []
    for i in range(max_steps):
        state = env.get_robot_state()
        pts = planner.scan_to_point(state, env.get_lidar_scan())
        action, info = planner(state, pts)
        traj.append([state[0, 0], state[1, 0], state[2, 0],
                     action[0, 0], action[1, 0], planner.min_distance])
        if info["arrive"]:
            return dict(arrived=True, steps=i, traj=np.array(traj))
        env.step(action)
        if env.collided:
            return dict(arrived=False, collided=True, steps=i,
                        traj=np.array(traj))
    return dict(arrived=False, steps=max_steps, traj=np.array(traj))


def _kwargs(cfg):
    cfg = dict(cfg)
    cfg["robot_kwargs"] = cfg.pop("robot", {}) or {}
    cfg["ipath_kwargs"] = cfg.pop("ipath", {}) or {}
    cfg["pan_kwargs"] = cfg.pop("pan", {}) or {}
    cfg["adjust_kwargs"] = cfg.pop("adjust", {}) or {}
    cfg["train_kwargs"] = cfg.pop("train", {}) or {}
    return cfg


def summarize(name, r):
    tr = r["traj"]
    # y when first crossing x in [8, 12] (the pillar band) and final pose
    band = tr[(tr[:, 0] > 8) & (tr[:, 0] < 12)]
    y_at_pillar = band[0, 1] if len(band) else float("nan")
    print(f"{name}: arrived={r.get('arrived')} steps={r['steps']} "
          f"final=({tr[-1,0]:.2f},{tr[-1,1]:.2f}) "
          f"y@pillar={y_at_pillar:.2f} min_d_final={tr[-1,5]:.3f}",
          flush=True)
    return r


if __name__ == "__main__":
    its = [int(a) for a in sys.argv[1:]] or [150, 200, 300]
    for it in its:
        summarize(f"iters={it}", run(it))
