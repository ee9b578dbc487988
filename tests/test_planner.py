"""Planner facade tests: construction, YAML loading, scan conversion, API."""

import os

import numpy as np
import pytest

from neupan_tpu.planner import NeuPan, neupan

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIFF_CKPT = os.path.join(REPO, "examples/model/diff_robot_default/model.npz")


def make_planner(**overrides):
    kwargs = dict(
        receding=5, step_time=0.1, ref_speed=2.0,
        robot_kwargs=dict(kinematics="diff", max_speed=[8, 1],
                          max_acce=[8, 3], length=1.6, width=2.0),
        ipath_kwargs=dict(waypoints=[[0, 0, 0], [20, 0, 0]],
                          curve_style="line"),
        pan_kwargs=dict(iter_num=1, dune_max_num=16, nrmp_max_num=4,
                        dune_checkpoint=DIFF_CKPT),
        adjust_kwargs=dict(q_s=1.0, p_u=1.0, eta=10.0, d_max=1.0, d_min=0.1),
    )
    kwargs.update(overrides)
    return NeuPan(**kwargs)


@pytest.mark.skipif(not os.path.exists(DIFF_CKPT), reason="checkpoint missing")
class TestFacade:
    def test_alias(self):
        assert neupan is NeuPan

    def test_forward_and_info_surface(self):
        p = make_planner()
        state = np.array([[0.0], [0.2], [0.0]])
        pts = np.array([[2.0, 2.5], [1.5, -1.5]])
        action, info = p(state, pts)
        assert action.shape == (2, 1)
        for key in ("state_tensor", "vel_tensor", "distance_tensor",
                    "ref_state_tensor", "ref_speed_tensor",
                    "ref_state_list", "opt_state_list", "stop", "arrive"):
            assert key in info
        assert len(p.opt_trajectory) == 6
        assert len(p.ref_trajectory) == 6
        assert p.dune_points.shape[1] == 2
        assert p.nrmp_points.shape[0] == 2
        assert np.isfinite(p.min_distance)

    def test_collision_stop(self):
        p = make_planner(collision_threshold=5.0)  # everything is "close"
        state = np.array([[0.0], [0.0], [0.0]])
        pts = np.array([[1.2], [0.0]])
        action, info = p(state, pts)
        assert info["stop"]
        assert info["collision"]  # stop latch == collision telemetry
        np.testing.assert_allclose(action, 0.0)
        p.reset()
        assert not p.info["collision"]

    def test_collision_flag_clear_when_far(self):
        p = make_planner(collision_threshold=0.01)
        action, info = p(np.array([[0.0], [0.0], [0.0]]),
                         np.array([[5.0], [3.0]]))
        assert not info["stop"] and not info["collision"]

    def test_device_key_cpu(self):
        # `device: cpu` must pin the planner's committed arrays to a CPU
        # device (and be accepted end-to-end), not be silently ignored.
        p = make_planner(device="cpu")
        assert p._device is not None and p._device.platform == "cpu"
        assert p.G.devices() == {p._device}
        action, _ = p(np.array([[0.0], [0.0], [0.0]]),
                      np.array([[4.0], [1.0]]))
        assert action.shape == (2, 1)

    def test_reset(self):
        p = make_planner()
        state = np.array([[0.0], [0.0], [0.0]])
        p(state, np.array([[3.0], [1.0]]))
        p.reset()
        assert not p.info["stop"] and not p.info["arrive"]
        np.testing.assert_allclose(p.cur_vel_array, 0.0)

    def test_update_adjust_parameters_scalar_lock(self):
        p = make_planner()
        p.update_adjust_parameters(eta=20.0, d_max=2.0)
        assert float(p.adjust_parameters.eta) == 20.0
        # scalar q_s initialized -> list update falls back to first element
        p.update_adjust_parameters(q_s=[2.0, 3.0, 4.0])
        assert float(p.adjust_parameters.q_s) == 2.0

    def test_vector_qs(self):
        p = make_planner(adjust_kwargs=dict(q_s=[1.0, 1.0, 0.5], p_u=1.0,
                                            eta=10.0, d_max=1.0, d_min=0.1))
        assert p.adjust_parameters.q_s.shape == (3,)
        p.update_adjust_parameters(q_s=[2.0, 2.0, 1.0])
        np.testing.assert_allclose(np.asarray(p.adjust_parameters.q_s),
                                   [2.0, 2.0, 1.0])
        with pytest.raises(ValueError):
            p.update_adjust_parameters(q_s=[1.0, 2.0])

    def test_set_reference_speed_and_paths(self):
        p = make_planner()
        p.set_reference_speed(3.5)
        assert p.ref_speed == 3.5 and p.ipath.ref_speed == 3.5
        p.update_initial_path_from_goal(np.array([[0.0], [0.0], [0.0]]),
                                        np.array([[5.0], [1.0], [0.0]]))
        assert p.initial_path is not None
        p.update_initial_path_from_waypoints(
            [np.array([[0.0], [0.0], [0.0]]), np.array([[4.0], [0.0], [0.0]])])
        np.testing.assert_allclose(p.waypoints[-1][0:2].ravel(), [4, 0])

    def test_missing_checkpoint_raises(self):
        with pytest.raises(FileNotFoundError):
            make_planner(pan_kwargs=dict(iter_num=1, dune_max_num=16,
                                         nrmp_max_num=4,
                                         dune_checkpoint="/nonexistent.pth"))

    def test_direct_train_passthrough(self):
        p = make_planner(pan_kwargs=dict(iter_num=1, dune_max_num=16,
                                         nrmp_max_num=4, dune_checkpoint=None),
                         train_kwargs=dict(direct_train=True))
        assert p.dune_params is not None


def test_yaml_roundtrip():
    path = os.path.join(REPO, "examples/corridor/diff/planner.yaml")
    if not os.path.exists(DIFF_CKPT):
        pytest.skip("checkpoint missing")
    p = NeuPan.init_from_yaml(path)
    assert p.T == 10 and p.dt == 0.1 and p.ref_speed == 4
    assert p.robot.kinematics == "diff"
    assert p.spec.dune_max_num == 100 and p.spec.nrmp.K == 10


def test_scan_to_point_filtering():
    p = make_planner() if os.path.exists(DIFF_CKPT) else pytest.skip("ckpt")
    scan = {
        "ranges": np.array([1.0, 5.0, 9.99, 10.0, 0.0]),
        "angle_min": -np.pi / 2, "angle_max": np.pi / 2,
        "range_min": 0.01, "range_max": 10.0,
    }
    state = np.array([[0.0], [0.0], [0.0]])
    pts = p.scan_to_point(state, scan)
    # range 10.0 (max) and 0.0 (below min) filtered out; 9.99 > max-0.02 too
    assert pts.shape == (2, 2)

    pts2, vels2 = p.scan_to_point_velocity(state, scan)
    assert pts2.shape == (2, 2) and vels2.shape == (2, 2)


def test_scan_to_point_world_frame():
    p = make_planner() if os.path.exists(DIFF_CKPT) else pytest.skip("ckpt")
    scan = {
        "ranges": np.array([2.0]),
        "angle_min": 0.0, "angle_max": 0.0,
        "range_min": 0.01, "range_max": 10.0,
    }
    # robot at (1, 1) facing +y: beam at angle 0 (robot frame) -> point (1, 3)
    state = np.array([[1.0], [1.0], [np.pi / 2]])
    pts = p.scan_to_point(state, scan)
    np.testing.assert_allclose(pts.ravel(), [1.0, 3.0], atol=1e-9)
