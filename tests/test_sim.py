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


def test_behavior_wander_moves_toward_goal():
    from neupan_tpu.sim import Behavior

    rng = np.random.default_rng(0)
    obs = circle_obstacle(0.0, 0.0, 0.5)
    b = Behavior(name="wander", range_low=[5, 5], range_high=[6, 6],
                 max_speed=2.0, rng=rng)
    obs.behavior = b
    b.update(obs, [obs], 0.1)
    # velocity points into the goal box (up-right) at max speed
    v = obs.velocity.ravel()
    assert v[0] > 0 and v[1] > 0
    assert np.isclose(np.linalg.norm(v), 2.0)


def test_behavior_rvo_repels_neighbors():
    from neupan_tpu.sim import Behavior

    rng = np.random.default_rng(0)
    a = circle_obstacle(0.0, 0.0, 0.5)
    other = circle_obstacle(0.5, 0.0, 0.5)   # close neighbor to the right
    b = Behavior(name="rvo", range_low=[10, -0.1], range_high=[10.1, 0.1],
                 max_speed=1.0, factor=5.0, rng=rng)
    plain = Behavior(name="dash", range_low=[10, -0.1], range_high=[10.1, 0.1],
                     max_speed=1.0, rng=np.random.default_rng(0))
    b.update(a, [a, other], 0.1)
    vx_rvo = a.velocity[0, 0]
    plain.update(a, [a, other], 0.1)
    vx_plain = a.velocity[0, 0]
    # the rvo flavor pushes away from the neighbor sitting toward the goal
    assert vx_rvo < vx_plain


def test_random_polygon_vertices_shape_and_radius():
    from neupan_tpu.sim import random_polygon_vertices

    rng = np.random.default_rng(3)
    v = random_polygon_vertices(rng, avg_radius_range=(0.5, 1.0), n=8)
    assert v.shape == (2, 8)
    r = np.linalg.norm(v, axis=0)
    assert np.all(r >= 0.5 - 1e-9) and np.all(r <= 1.0 + 1e-9)


def test_env_loader_random_distribution_and_behavior(tmp_path):
    from neupan_tpu.sim.env_loader import load_env

    env_file = tmp_path / "env.yaml"
    env_file.write_text("""
world: {height: 20, width: 20, step_time: 0.1, seed: 3}
robot:
  - kinematics: {name: 'diff'}
    shape: {name: 'rectangle', length: 1.0, width: 1.0}
    state: [0, 0, 0]
    goal: [10, 0, 0]
obstacle:
  - number: 5
    distribution: {name: 'random', range_low: [2, -5, 0], range_high: [15, 5, 0]}
    shape:
      - {name: 'circle', radius: 0.5}
      - {name: 'polygon', random_shape: true, avg_radius_range: [0.4, 0.8]}
    behavior: {name: 'rvo', vxmax: 1.0, vymax: 1.0, range_low: [2, -5], range_high: [15, 5]}
""")
    sim = load_env(str(env_file), make_robot())
    assert len(sim.obstacles) == 5
    centers = np.hstack([o.center for o in sim.obstacles])
    assert np.all(centers[0] >= 1.0) and np.all(centers[0] <= 16.0)
    assert all(o.behavior is not None for o in sim.obstacles)
    # deterministic: same seed -> same placement
    sim2 = load_env(str(env_file), make_robot())
    np.testing.assert_allclose(
        np.hstack([o.center for o in sim2.obstacles]), centers)
    # obstacles actually move under behavior
    before = centers.copy()
    for _ in range(5):
        sim.step(np.zeros((2, 1)))
    after = np.hstack([o.center for o in sim.obstacles])
    assert np.linalg.norm(after - before) > 1e-3


def test_all_scenario_configs_load():
    """Every shipped scenario pair (env.yaml + planner.yaml) must construct
    (the reference ships ~10 scenario families x up to 3 kinematics)."""
    import glob
    import os

    from neupan_tpu.planner import NeuPan
    from neupan_tpu.sim.env_loader import load_env

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    planner_files = sorted(glob.glob(os.path.join(repo, "examples/*/*/planner.yaml")))
    assert len(planner_files) >= 25
    families = {p.split(os.sep)[-3] for p in planner_files}
    assert {"convex_obs", "corridor", "dyna_non_obs", "dyna_obs", "non_obs",
            "pf", "pf_obs", "polygon_robot", "reverse"} <= families
    for pf in planner_files:
        planner = NeuPan.init_from_yaml(pf)
        sim = load_env(os.path.join(os.path.dirname(pf), "env.yaml"),
                       planner.robot)
        scan = sim.get_lidar_scan()
        assert len(scan["ranges"]) > 0


def test_renderer_frames_and_gif(tmp_path):
    from neupan_tpu.sim.render import Renderer

    robot = make_robot()
    sim = Sim2D(robot, [0, 0, 0], [5, 0, 0],
                [circle_obstacle(3.0, 1.0, 0.5)], LidarSpec(number=10))
    r = Renderer(sim, display=False, figsize=(2, 2))
    for _ in range(3):
        r.draw_frame()
        sim.step(np.array([[1.0], [0.0]]))
    assert len(r.frames) == 3
    assert r.frames[0].ndim == 3 and r.frames[0].shape[2] == 3
    out = r.save_animation(str(tmp_path / "anim.gif"), fps=5)
    assert out is not None
    import os
    assert os.path.getsize(out) > 0
    r.close()


def test_orca_head_on_agents_avoid_each_other():
    """Two rvo agents driving head-on must pass without overlapping —
    the ORCA half-plane construction + incremental LP (sim.Behavior),
    which replaced the round-3 reciprocal-repulsion stand-in."""
    from neupan_tpu.sim import Behavior

    a = circle_obstacle(0.0, 0.0, 0.4)
    b = circle_obstacle(6.0, 0.05, 0.4)
    ba = Behavior("rvo", max_speed=1.0, rng=np.random.default_rng(1))
    bb = Behavior("rvo", max_speed=1.0, rng=np.random.default_rng(2))
    a.behavior, b.behavior = ba, bb
    dt = 0.1
    min_d = np.inf
    for _ in range(120):
        ba.goal = np.array([[6.0], [0.0]])
        bb.goal = np.array([[0.0], [0.0]])
        ba.update(a, [a, b], dt)
        bb.update(b, [a, b], dt)
        a.step(dt)
        b.step(dt)
        min_d = min(min_d, float(np.linalg.norm(a.center - b.center)))
    assert min_d > 0.78          # sum of radii = 0.8: grazing, no overlap
    assert float(a.center[0]) > 5.0 and float(b.center[0]) < 1.0  # both pass
