"""Built-in 2-D simulator tests: lidar ray-cast, collision, env loading."""

import numpy as np
import pytest

from neupan_tpu.robot import Robot
from neupan_tpu.sim import (
    LidarSpec,
    Sim2D,
    circle_obstacle,
    polygon_obstacle,
    rectangle_obstacle,
)


def make_robot():
    return Robot.create(receding=10, step_time=0.1, kinematics="diff",
                        max_speed=[8, 1], max_acce=[8, 3], length=1.0,
                        width=1.0)


def test_lidar_hits_wall_at_known_range():
    robot = make_robot()
    wall = rectangle_obstacle(5.0, 0.0, 0.0, 0.2, 10.0)  # wall at x ~= 4.9
    sim = Sim2D(robot, [0, 0, 0], [10, 0, 0], [wall],
                LidarSpec(range_max=10.0, number=9,
                          angle_min=-np.pi / 4, angle_max=np.pi / 4))
    scan = sim.get_lidar_scan()
    # the central beam looks straight down +x: range ~ 4.9
    mid = len(scan["ranges"]) // 2
    assert np.isclose(scan["ranges"][mid], 4.9, atol=1e-6)


def test_lidar_no_obstacles_full_range():
    sim = Sim2D(make_robot(), [0, 0, 0], [10, 0, 0], [],
                LidarSpec(range_max=7.0, number=5))
    scan = sim.get_lidar_scan()
    assert np.allclose(scan["ranges"], 7.0)


def test_lidar_rotates_with_robot():
    wall = rectangle_obstacle(5.0, 0.0, 0.0, 0.2, 20.0)
    sim = Sim2D(make_robot(), [0, 0, np.pi / 2], [10, 0, 0], [wall],
                LidarSpec(number=5, angle_min=-np.pi / 2, angle_max=np.pi / 2))
    scan = sim.get_lidar_scan()
    # with the robot facing +y, the beam at angle -pi/2 (robot frame) faces +x
    assert np.isclose(scan["ranges"][0], 4.9, atol=1e-6)


def test_dynamic_obstacle_velocity_in_scan():
    mover = circle_obstacle(3.0, 0.0, 0.5, velocity=(0.0, 1.5))
    sim = Sim2D(make_robot(), [0, 0, 0], [10, 0, 0], [mover],
                LidarSpec(number=3, angle_min=-0.1, angle_max=0.1))
    scan = sim.get_lidar_scan()
    hit = scan["ranges"] < scan["range_max"] - 0.02
    assert np.any(hit)
    vels = scan["velocity"][:, hit]
    np.testing.assert_allclose(vels[1], 1.5)
    # obstacle actually moves on step
    y0 = mover.vertices[1].mean()
    sim.step(np.zeros((2, 1)))
    assert mover.vertices[1].mean() > y0


def test_collision_detection():
    block = rectangle_obstacle(1.2, 0.0, 0.0, 1.0, 1.0)
    sim = Sim2D(make_robot(), [0, 0, 0], [10, 0, 0], [block])
    assert not sim.collided
    # drive straight into the block
    for _ in range(12):
        sim.step(np.array([[1.0], [0.0]]))
        if sim.collided:
            break
    assert sim.collided


def test_arrival():
    sim = Sim2D(make_robot(), [0, 0, 0], [1.0, 0, 0], [], goal_threshold=0.3)
    for _ in range(12):
        sim.step(np.array([[1.0], [0.0]]))
    assert sim.arrived() and sim.done()


def test_env_loader_corridor(tmp_path):
    import os

    from neupan_tpu.sim.env_loader import load_env

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_file = os.path.join(repo, "examples/corridor/diff/env.yaml")
    sim = load_env(env_file, make_robot())
    assert len(sim.obstacles) == 6
    np.testing.assert_allclose(sim.state.ravel(), [-5, 20, 0])
    scan = sim.get_lidar_scan()
    assert len(scan["ranges"]) == 100
    # corridor walls visible
    assert np.any(scan["ranges"] < 10.0)
