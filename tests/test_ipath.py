"""InitialPath subsystem tests: reference assembly, tracking, arrival,
gear splitting."""

import numpy as np
import pytest

from neupan_tpu.ipath import InitialPath
from neupan_tpu.robot import Robot


def make_robot(kind="diff"):
    return Robot.create(receding=10, step_time=0.1, kinematics=kind,
                        max_speed=[8, 1], max_acce=[8, 3], length=1.6,
                        width=2.0, wheelbase=3.0 if kind == "acker" else None)


def make_ipath(kind="diff", **kwargs):
    defaults = dict(waypoints=[[0, 0, 0], [20, 0, 0]], curve_style="line")
    defaults.update(kwargs)
    return InitialPath(10, 0.1, 2.0, make_robot(kind), **defaults)


def test_lazy_path_generation_and_tracking():
    ip = make_ipath()
    state = np.array([[0.0], [0.5], [0.0]])
    assert ip.initial_path is None
    arrived = ip.check_arrive(state)
    assert not arrived
    assert ip.initial_path is not None
    assert ip.curve_number == 1


def test_generate_nom_ref_state_shapes_and_rollout():
    ip = make_ipath()
    state = np.array([[0.0], [0.0], [0.0]])
    ip.check_arrive(state)
    vel = np.tile([[1.0], [0.0]], (1, 10))
    nom_s, nom_u, ref_s, ref_us = ip.generate_nom_ref_state(state, vel, 2.0)
    assert nom_s.shape == (3, 11)
    assert nom_u.shape == (2, 10)
    assert ref_s.shape == (3, 11)
    assert ref_us.shape == (10,)
    # nominal rollout: x advances by v*dt each step
    np.testing.assert_allclose(nom_s[0], np.arange(11) * 0.1, atol=1e-9)
    # reference advances at ref_speed*dt = 0.2 along the line
    assert ref_s[0, 1] > ref_s[0, 0]
    # forward gear => ref_us = ref_speed
    np.testing.assert_allclose(ref_us, 2.0)


def test_reference_advance_matches_speed():
    ip = make_ipath(interval=0.05)  # interval < ref_speed*dt -> index jumps
    state = np.array([[0.0], [0.0], [0.0]])
    ip.check_arrive(state)
    vel = np.zeros((2, 10))
    _, _, ref_s, _ = ip.generate_nom_ref_state(state, vel, 2.0)
    gaps = np.diff(ref_s[0])
    # each step advances ~ref_speed*dt = 0.2 along x
    np.testing.assert_allclose(gaps, 0.2, atol=0.06)


def test_arrival_detection():
    ip = make_ipath()
    near_end = np.array([[19.99], [0.0], [0.0]])
    ip.check_arrive(np.array([[0.0], [0.0], [0.0]]))  # generate path
    # walk the index to the end
    for _ in range(60):
        if ip.check_arrive(near_end):
            break
    assert ip.arrive_flag


def test_gear_split_reeds():
    ip = make_ipath("acker", waypoints=[[0, 0, 0], [-3, 0, 0]],
                    curve_style="reeds", min_radius=2.0)
    ip.check_arrive(np.array([[0.0], [0.0], [0.0]]))
    # a behind-goal RS path must contain >= 2 gear segments
    assert ip.curve_number >= 2
    gears = {c[0][-1, 0] for c in ip.curve_list}
    assert -1.0 in gears


def test_set_initial_path_external():
    ip = make_ipath()
    path = [np.array([[float(i)], [0.0], [0.0], [1.0]]) for i in range(10)]
    ip.set_initial_path(path)
    assert ip.curve_number == 1
    assert np.isclose(ip.interval, 1.0)


def test_update_from_goal_and_waypoints():
    ip = make_ipath()
    ip.update_initial_path_from_goal(np.array([[0.0], [0.0], [0.0]]),
                                     np.array([[5.0], [5.0], [0.0]]))
    assert ip.initial_path is not None
    end = ip.initial_path[-1]
    np.testing.assert_allclose(end[0:2].ravel(), [5, 5], atol=1e-6)

    ip.set_ipath_with_waypoints([np.array([[0.0], [0.0], [0.0]]),
                                 np.array([[3.0], [0.0], [0.0]])])
    end = ip.initial_path[-1]
    np.testing.assert_allclose(end[0:2].ravel(), [3, 0], atol=1e-6)


def test_loop_mode_resets():
    ip = make_ipath(loop=True, waypoints=[[0, 0, 0], [5, 0, 0]])
    ip.check_arrive(np.array([[0.0], [0.0], [0.0]]))
    # loop mode appends the start as final waypoint
    end = ip.initial_path[-1]
    np.testing.assert_allclose(end[0:2].ravel(), [0, 0], atol=1e-6)


def test_exact_models_match_robot_step():
    import jax.numpy as jnp

    for kind in ("diff", "acker", "omni"):
        robot = make_robot(kind)
        ip = InitialPath(10, 0.1, 2.0, robot,
                         waypoints=[[0, 0, 0], [10, 0, 0]])
        state = np.array([[0.3], [-0.2], [0.4]])
        vel = np.array([[1.0], [0.5]])
        nxt = ip.motion_predict_model(state, vel, robot.L, 0.1)
        expect = robot.step(jnp.asarray(state[:, 0]), jnp.asarray(vel[:, 0]),
                            0.1)
        np.testing.assert_allclose(nxt[:, 0], np.asarray(expect), atol=1e-6)
