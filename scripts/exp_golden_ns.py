"""Diagnose ns_iters sensitivity on the corridor-wall golden states.

For each recorded golden state, runs a FRESH planner (no warm-start
compounding) at several ns_iters values and reports per-step action
differences vs ns=40.  Distinguishes "solver genuinely wrong at low ns"
from "chaotic compounding through planner warm-start state".
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_golden import GOLDEN_DIR, wall_points  # noqa: E402
from neupan_tpu.planner import NeuPan  # noqa: E402

DIFF_CKPT = os.path.join(REPO, "examples/model/diff_robot_default/model.npz")


def make_planner(ns):
    return NeuPan(
        receding=10, step_time=0.1, ref_speed=4.0,
        robot_kwargs=dict(kinematics="diff", max_speed=[8, 1],
                          max_acce=[8, 3], length=1.6, width=2.0),
        ipath_kwargs=dict(waypoints=[[0, 20, 0], [60, 20, 0]],
                          curve_style="line"),
        pan_kwargs=dict(iter_num=2, dune_max_num=100, nrmp_max_num=10,
                        dune_checkpoint=DIFF_CKPT,
                        admm=dict(ns_iters=ns)),
        adjust_kwargs=dict(q_s=1.0, p_u=1.0, eta=15.0, d_max=1.0, d_min=0.1),
    )


def fresh_actions(states, ns):
    """One fresh planner per state: no cross-step warm-start."""
    points = wall_points()
    out = []
    for s in states:
        planner = make_planner(ns)
        a, _ = planner(s.reshape(3, 1), points)
        out.append(a.ravel())
    return np.asarray(out)


def stateful_actions(states, ns):
    points = wall_points()
    planner = make_planner(ns)
    out = []
    for s in states:
        a, _ = planner(s.reshape(3, 1), points)
        out.append(a.ravel())
    return np.asarray(out)


def main():
    out = open(os.path.join(REPO, "scripts", "exp_golden_ns.out"), "w")

    def emit(s):
        print(s, flush=True)
        out.write(s + "\n")
        out.flush()

    golden = np.load(os.path.join(GOLDEN_DIR, "corridor_wall_diff.npz"))
    states = golden["states"]
    emit("== fresh planner per state (no warm-start compounding) ==")
    base = fresh_actions(states, 40)
    for ns in (64, 48, 36, 32, 24):
        a = fresh_actions(states, ns)
        d = np.abs(a - base).max(axis=1)
        emit(f"ns={ns:2d}: max={d.max():.2e} p50={np.median(d):.2e} "
             f"nbad(>1e-3)={(d > 1e-3).sum()}/{len(d)}")


if __name__ == "__main__":
    main()
