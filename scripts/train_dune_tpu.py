"""Train DUNE checkpoints for the standard robot geometries on the TPU.

Produces examples/model/<name>/model.npz (our own weights, replacing the
converted reference checkpoints).

Usage: python scripts/train_dune_tpu.py [diff|acker|polygon|all] [epochs]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from neupan_tpu.robot import Robot
from neupan_tpu.training.dune_train import DuneTrainer

GEOMETRIES = {
    "diff_robot_default": dict(kinematics="diff", length=1.6, width=2.0,
                               max_speed=[8, 1], max_acce=[8, 3]),
    "acker_robot_default": dict(kinematics="acker", length=4.6, width=1.6,
                                wheelbase=3.0, max_speed=[8, 1],
                                max_acce=[8, 1]),
    "polygon_robot": dict(kinematics="diff",
                          vertices=[[-0.8, -1.0], [-1.8, 1.0], [1.8, 1.0],
                                    [0.8, -1.0]],
                          max_speed=[8, 3], max_acce=[8, 3]),
}


def train(name: str, epochs: int):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "examples", "model", name)
    robot = Robot.create(receding=10, step_time=0.1, **GEOMETRIES[name])
    trainer = DuneTrainer(robot.G, robot.h, out_dir)
    params, ckpt = trainer.start(data_size=100000, epoch=epochs,
                                 batch_size=256, valid_freq=max(epochs // 20, 1),
                                 save_freq=max(epochs // 4, 1), lr=2e-4,
                                 lr_decay=0.5, decay_freq=max(epochs // 3, 1))
    from neupan_tpu.models import obs_point_net

    final = os.path.join(out_dir, "model.npz")
    obs_point_net.save_checkpoint(final, params)
    print(f"[{name}] final checkpoint: {final}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    names = list(GEOMETRIES) if which == "all" else [
        {"diff": "diff_robot_default", "acker": "acker_robot_default",
         "polygon": "polygon_robot"}.get(which, which)]
    for n in names:
        train(n, epochs)
