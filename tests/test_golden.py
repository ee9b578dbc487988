"""Golden regression tests: recorded control sequences must stay stable.

The reference cannot run in this environment (cvxpy/ECOS/gctl are absent),
so reference-vs-ours goldens are replaced by self-goldens recorded on first
run.  Two layers:

* **Teacher-forced per-step golden** — the golden stores a fixed state
  trajectory plus the action the planner produced at each state.  Replay
  feeds the *recorded* states back, so each step is an independent
  open-loop check at the solver-accuracy contract (atol 1e-3) with no
  closed-loop error compounding.  (A pointwise closed-loop comparison is
  chaotic: the obstacle-avoidance map amplifies 1e-6 per-step solver noise
  to O(1) over ~20 ticks, so it cannot distinguish a real regression from
  benign roundoff.)
* **Closed-loop behavioral golden** — the rollout must still make progress
  toward the goal and never trip the collision stop.
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
DIFF_CKPT = os.path.join(REPO, "examples/model/diff_robot_default/model.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(DIFF_CKPT), reason="example checkpoint missing")


def make_planner():
    from neupan_tpu.planner import NeuPan

    return NeuPan(
        receding=10, step_time=0.1, ref_speed=4.0,
        robot_kwargs=dict(kinematics="diff", max_speed=[8, 1],
                          max_acce=[8, 3], length=1.6, width=2.0),
        ipath_kwargs=dict(waypoints=[[0, 20, 0], [60, 20, 0]],
                          curve_style="line"),
        pan_kwargs=dict(iter_num=2, dune_max_num=100, nrmp_max_num=10,
                        dune_checkpoint=DIFF_CKPT),
        adjust_kwargs=dict(q_s=1.0, p_u=1.0, eta=15.0, d_max=1.0, d_min=0.1),
    )


def wall_points():
    xs = np.linspace(-3, 10, 60)
    return np.vstack([xs, np.full_like(xs, 21.5)])


def closed_loop(n_steps=20):
    """Closed-loop rollout -> (states (n,3), actions (n,2), stops (n,))."""
    from neupan_tpu.ipath import InitialPath

    planner = make_planner()
    points = wall_points()
    state = np.array([[-5.0], [20.0], [0.0]])
    states, actions, stops = [], [], []
    for _ in range(n_steps):
        states.append(state.ravel().copy())
        action, info = planner(state, points)
        actions.append(action.ravel())
        stops.append(bool(info["stop"]))
        state = InitialPath.diff_model(state, action, 0.1)
    return np.asarray(states), np.asarray(actions), np.asarray(stops)


def teacher_forced_actions(states):
    """Feed the *recorded* state sequence; return per-step actions."""
    planner = make_planner()
    points = wall_points()
    actions = []
    for s in states:
        action, _ = planner(s.reshape(3, 1), points)
        actions.append(action.ravel())
    return np.asarray(actions)


@pytest.mark.slow
def test_control_sequence_regression():
    path = os.path.join(GOLDEN_DIR, "corridor_wall_diff.npz")
    if not os.path.exists(path) or "states" not in np.load(path).files:
        states, actions, _ = closed_loop()
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(path, states=states, actions=actions)
        pytest.skip("golden recorded; rerun to compare")
    golden = np.load(path)
    actions = teacher_forced_actions(golden["states"])
    np.testing.assert_allclose(actions, golden["actions"], atol=1e-3)


@pytest.mark.slow
def test_closed_loop_behavior():
    states, actions, stops = closed_loop(n_steps=20)
    # never trips the collision stop near the wall
    assert not stops.any()
    # makes forward progress along the corridor
    assert states[-1, 0] > states[0, 0] + 3.0
    # stays clear of the wall (robot half-width 1.0, wall at y=21.5)
    assert np.all(states[:, 1] < 21.5 - 0.9)
