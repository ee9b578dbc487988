"""Environment YAML loader for the built-in 2-D simulator.

Reads a practical subset of the reference's IR-SIM ``env.yaml`` schema
(reference: example/corridor/diff/env.yaml — world / robot / obstacle
sections) so our scenario configs stay familiar, and builds a ``Sim2D``.

Supported obstacle shapes: rectangle (length/width), circle (radius),
polygon (vertices); optional per-obstacle linear ``velocity`` for dynamic
scenes.
"""

from __future__ import annotations

from typing import List

import numpy as np
import yaml

from neupan_tpu.robot import Robot
from neupan_tpu.sim import (
    LidarSpec,
    Obstacle,
    Sim2D,
    circle_obstacle,
    polygon_obstacle,
    rectangle_obstacle,
)
from neupan_tpu.utils import file_check


def load_env(yaml_file: str, robot: Robot) -> Sim2D:
    with open(file_check(yaml_file), "r") as f:
        cfg = yaml.safe_load(f) or {}

    world = cfg.get("world", {}) or {}
    step_time = world.get("step_time", robot.dt)

    rob_cfgs = cfg.get("robot", []) or []
    rob = rob_cfgs[0] if isinstance(rob_cfgs, list) else rob_cfgs
    start = np.asarray(rob.get("state", [0, 0, 0]), dtype=np.float64)[:3]
    goal = np.asarray(rob.get("goal", [10, 10, 0]), dtype=np.float64)[:3]
    goal_threshold = rob.get("goal_threshold", 0.3)

    lidar = LidarSpec()
    for sensor in rob.get("sensors", []) or []:
        if sensor.get("type") == "lidar2d":
            ar = sensor.get("angle_range", 2 * np.pi)
            lidar = LidarSpec(
                range_min=sensor.get("range_min", 0.0),
                range_max=sensor.get("range_max", 10.0),
                angle_min=-ar / 2 if "angle_range" in sensor else sensor.get("angle_min", -np.pi),
                angle_max=ar / 2 if "angle_range" in sensor else sensor.get("angle_max", np.pi),
                number=sensor.get("number", 100),
            )

    obstacles: List[Obstacle] = []
    for group in cfg.get("obstacle", []) or []:
        shapes = group.get("shape", [])
        if isinstance(shapes, dict):
            shapes = [shapes]
        states = group.get("state", [])
        vels = group.get("velocity", [[0.0, 0.0]] * len(states))
        n = group.get("number", len(states))
        for i in range(min(n, len(states))):
            shape = shapes[i % len(shapes)] if shapes else {"name": "circle", "radius": 0.5}
            st = states[i]
            vel = vels[i] if i < len(vels) else [0.0, 0.0]
            name = shape.get("name", "circle")
            if name == "rectangle":
                obstacles.append(rectangle_obstacle(
                    st[0], st[1], st[2] if len(st) > 2 else 0.0,
                    shape["length"], shape["width"], vel))
            elif name == "circle":
                obstacles.append(circle_obstacle(
                    st[0], st[1], shape.get("radius", 0.5), velocity=vel))
            elif name == "polygon":
                verts = np.asarray(shape["vertices"], dtype=np.float64)
                if verts.shape[0] != 2:
                    verts = verts.T
                offset = np.asarray([[st[0]], [st[1]]])
                obstacles.append(polygon_obstacle(verts + offset, vel))

    return Sim2D(robot, start, goal, obstacles, lidar,
                 goal_threshold=goal_threshold, step_time=step_time)
