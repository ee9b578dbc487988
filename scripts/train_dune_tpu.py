"""Train DUNE checkpoints for the standard robot geometries on the TPU.

Produces examples/model/<name>/model.npz (our own weights, replacing the
converted reference checkpoints).

Usage: python scripts/train_dune_tpu.py [diff|acker|polygon|all] [epochs]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
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
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "examples", "model", name)
    robot = Robot.create(receding=10, step_time=0.1, **GEOMETRIES[name])
    trainer = DuneTrainer(robot.G, robot.h, out_dir)
    # Hyperparameters mirror the reference trainer's published run
    # (reference: blocks/dune_train.py:142-154 — data 100k, batch 256, Adam
    # lr 5e-5 wd 1e-4, lr x0.5 every 1500 epochs, validate/100, save/500),
    # so the results.txt losses are directly comparable.
    t0 = time.time()
    params, ckpt = trainer.start(data_size=100000, epoch=epochs,
                                 batch_size=256,
                                 valid_freq=min(100, max(epochs // 20, 1)),
                                 save_freq=min(500, max(epochs // 4, 1)),
                                 lr=5e-5, lr_decay=0.5,
                                 decay_freq=min(1500, max(epochs // 3, 1)))
    wall = time.time() - t0
    from neupan_tpu.models import obs_point_net
    from neupan_tpu.training.labels import polygon_distance_labels
    import jax.numpy as jnp

    # Deploy gate: never overwrite the shipped checkpoint with a model that
    # has not actually converged (the 4-term loss has a constant-function
    # local minimum; see DuneTrainer.start).  Reference-class quality is
    # mu ~1e-5 / dist ~1e-4 (reference results.txt:9-33); gate an order of
    # magnitude above that.
    G = jnp.asarray(robot.G, jnp.float32)
    h = jnp.asarray(robot.h, jnp.float32)
    pts = jax.random.uniform(jax.random.PRNGKey(123), (20000, 2),
                             minval=-25.0, maxval=25.0)
    with jax.default_matmul_precision("highest"):
        mu_l, d_l = polygon_distance_labels(G, h, pts)
        mu_o = obs_point_net.forward(params, pts)
        d_o = jnp.einsum("ne,ne->n", mu_o, pts @ G.T - h.reshape(1, -1))
        mu_mse = float(jnp.mean((mu_o - mu_l) ** 2))
        d_mse = float(jnp.mean((d_o - d_l) ** 2))
    ok = mu_mse < 1e-4 and d_mse < 5e-3
    trainer._log(f"[{name}] trained {epochs} epochs in {wall:.1f}s "
                 f"({jax.default_backend()}); holdout mu_mse={mu_mse:.2e} "
                 f"dist_mse={d_mse:.2e} gate={'PASS' if ok else 'FAIL'}")
    if not ok:
        trainer._log(f"[{name}] NOT deploying: quality gate failed "
                     f"(last checkpoint kept at {ckpt})")
        return False
    final = os.path.join(out_dir, "model.npz")
    obs_point_net.save_checkpoint(final, params)
    trainer._log(f"[{name}] deployed checkpoint: {final}")
    return True


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    names = list(GEOMETRIES) if which == "all" else [
        {"diff": "diff_robot_default", "acker": "acker_robot_default",
         "polygon": "polygon_robot"}.get(which, which)]
    for n in names:
        train(n, epochs)
