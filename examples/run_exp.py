"""Closed-loop scenario driver for neupan_tpu (parity with the reference's
example/run_exp.py, but using the built-in Sim2D instead of IR-SIM).

Usage:
    python examples/run_exp.py -e corridor -d diff [-v] [-m 1000] [-q]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", os.environ.get("NEUPAN_PLATFORM", "cpu"))
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "tpu,cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from neupan_tpu.planner import NeuPan  # noqa: E402
from neupan_tpu.sim.env_loader import load_env  # noqa: E402


def main(env_file, planner_file, point_vel=False, max_steps=1000,
         reverse=False, quiet=False):
    planner = NeuPan.init_from_yaml(planner_file)
    env = load_env(env_file, planner.robot)

    for i in range(max_steps):
        robot_state = env.get_robot_state()
        lidar_scan = env.get_lidar_scan()

        if point_vel:
            points, point_velocities = planner.scan_to_point_velocity(
                robot_state, lidar_scan)
        else:
            points = planner.scan_to_point(robot_state, lidar_scan)
            point_velocities = None

        action, info = planner(robot_state, points, point_velocities)

        if info["stop"] and not quiet:
            print("NeuPAN stops because of minimum distance")
        if info["arrive"]:
            if not quiet:
                print(f"NeuPAN arrives at the target in {i} steps")
            return dict(arrived=True, collided=env.collided, steps=i)

        env.step(action)
        if env.collided:
            if not quiet:
                print("collision detected")
            return dict(arrived=False, collided=True, steps=i)

        if i == 0 and reverse:
            for j in range(len(planner.initial_path)):
                planner.initial_path[j][-1, 0] = -1
                planner.initial_path[j][-2, 0] += 3.14

        if not quiet and i % 20 == 0:
            s = env.get_robot_state()
            print(f"step {i}: pos=({s[0,0]:.2f},{s[1,0]:.2f}) "
                  f"min_dist={planner.min_distance:.3f}")

    return dict(arrived=False, collided=env.collided, steps=max_steps)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-e", "--example", type=str, default="corridor")
    parser.add_argument("-d", "--kinematics", type=str, default="diff")
    parser.add_argument("-v", "--point_vel", action="store_true")
    parser.add_argument("-m", "--max_steps", type=int, default=1000)
    parser.add_argument("-q", "--quiet", action="store_true")
    args = parser.parse_args()

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        args.example, args.kinematics)
    reverse = args.example == "reverse" and args.kinematics == "diff"
    result = main(os.path.join(base, "env.yaml"),
                  os.path.join(base, "planner.yaml"),
                  args.point_vel, args.max_steps, reverse, args.quiet)
    print(result)
