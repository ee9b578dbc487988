"""Golden regression tests: recorded control sequences must stay stable.

The reference cannot run in this environment (cvxpy/ECOS/gctl are absent),
so reference-vs-ours goldens are replaced by self-goldens: the first run on
a given machine records the control sequence for fixed scenarios; later
runs must reproduce it within the solver's accuracy budget.  This catches
numeric regressions in any layer of the stack (geometry, DUNE, QP, PAN).
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
DIFF_CKPT = os.path.join(REPO, "examples/model/diff_robot_default/model.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(DIFF_CKPT), reason="example checkpoint missing")


def drive_sequence(n_steps=20):
    """Fixed deterministic scenario -> stacked (n_steps, 2) actions."""
    from neupan_tpu.ipath import InitialPath
    from neupan_tpu.planner import NeuPan

    planner = NeuPan(
        receding=10, step_time=0.1, ref_speed=4.0,
        robot_kwargs=dict(kinematics="diff", max_speed=[8, 1],
                          max_acce=[8, 3], length=1.6, width=2.0),
        ipath_kwargs=dict(waypoints=[[0, 20, 0], [60, 20, 0]],
                          curve_style="line"),
        pan_kwargs=dict(iter_num=2, dune_max_num=100, nrmp_max_num=10,
                        dune_checkpoint=DIFF_CKPT),
        adjust_kwargs=dict(q_s=1.0, p_u=1.0, eta=15.0, d_max=1.0, d_min=0.1),
    )
    state = np.array([[-5.0], [20.0], [0.0]])
    xs = np.linspace(-3, 10, 60)
    points = np.vstack([xs, np.full_like(xs, 21.5)])
    actions = []
    for _ in range(n_steps):
        action, _ = planner(state, points)
        actions.append(action.ravel())
        state = InitialPath.diff_model(state, action, 0.1)
    return np.asarray(actions)


@pytest.mark.slow
def test_control_sequence_regression():
    path = os.path.join(GOLDEN_DIR, "corridor_wall_diff.npz")
    actions = drive_sequence()
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(path, actions=actions)
        pytest.skip("golden recorded; rerun to compare")
    golden = np.load(path)["actions"]
    np.testing.assert_allclose(actions, golden, atol=1e-3)
