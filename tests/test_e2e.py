"""End-to-end closed-loop tests: planner + internal Sim2D on real scenarios.

These are the integration oracle the reference delegates to IR-SIM
(SURVEY.md §4): the robot must reach the path end without collision.
Marked slow: each run compiles the full planner graph once.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))

DIFF_CKPT = os.path.join(REPO, "examples/model/diff_robot_default/model.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(DIFF_CKPT), reason="example DUNE checkpoint missing")


def run_scenario(example, kinematics, max_steps=600, point_vel=False):
    import run_exp

    base = os.path.join(REPO, "examples", example, kinematics)
    return run_exp.main(os.path.join(base, "env.yaml"),
                        os.path.join(base, "planner.yaml"),
                        point_vel=point_vel, max_steps=max_steps,
                        reverse=False, quiet=True)


@pytest.mark.slow
def test_corridor_diff_arrives_without_collision():
    result = run_scenario("corridor", "diff")
    assert result["arrived"], f"did not arrive: {result}"
    assert not result["collided"], f"collided: {result}"


@pytest.mark.slow
def test_pf_diff_pure_path_following():
    result = run_scenario("pf", "diff", max_steps=300)
    assert result["arrived"] and not result["collided"], result


@pytest.mark.slow
def test_non_obs_diff():
    result = run_scenario("non_obs", "diff", max_steps=500)
    assert result["arrived"] and not result["collided"], result


@pytest.mark.slow
def test_dyna_obs_diff_with_point_velocities():
    result = run_scenario("dyna_obs", "diff", max_steps=500, point_vel=True)
    assert result["arrived"] and not result["collided"], result


@pytest.mark.slow
def test_corridor_acker_arrives():
    result = run_scenario("corridor", "acker", max_steps=400)
    assert result["arrived"] and not result["collided"], result


@pytest.mark.slow
def test_corridor_omni_arrives():
    result = run_scenario("corridor", "omni", max_steps=400)
    assert result["arrived"] and not result["collided"], result


@pytest.mark.slow
def test_reverse_acker_parks_backwards():
    result = run_scenario("reverse", "acker", max_steps=300)
    assert result["arrived"] and not result["collided"], result


@pytest.mark.slow
def test_pf_obs_diff_multi_waypoint():
    result = run_scenario("pf_obs", "diff", max_steps=400)
    assert result["arrived"] and not result["collided"], result
