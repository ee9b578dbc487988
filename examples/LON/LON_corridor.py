"""LON example: tune adjust parameters online through the QP layer.

Parity with the reference example/LON/LON_corridor.py: run closed-loop
corridor episodes in the built-in simulator; per step, differentiate the
distance loss through the NRMP QP into [p_u, eta, d_max] and apply Adam.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from neupan_tpu.lon import LONTuner, step_loss_and_grad  # noqa: E402
from neupan_tpu.planner import NeuPan  # noqa: E402
from neupan_tpu.sim.env_loader import load_env  # noqa: E402

EPOCHS = int(os.environ.get("LON_EPOCHS", "3"))
MAX_STEPS = int(os.environ.get("LON_MAX_STEPS", "120"))


def run_episode(planner, tuner, base):
    env = load_env(os.path.join(base, "env.yaml"), planner.robot)
    planner.reset()
    losses = []
    for _ in range(MAX_STEPS):
        state = env.get_robot_state()
        scan = env.get_lidar_scan()
        points = planner.scan_to_point(state, scan)

        action, info = planner(state, points)
        if info["arrive"]:
            break

        # differentiate the distance loss wrt the adjust parameters and step
        if points is not None:
            nom_s, nom_u, ref_s, ref_us = planner.ipath.generate_nom_ref_state(
                state, planner.cur_vel_array, planner.ref_speed)
            pts, vels, mask = planner._pad_points(points, None)
            loss, grads, _ = step_loss_and_grad(
                planner.spec, planner.dune_params, planner.G, planner.h,
                planner.adjust,
                jnp.asarray(nom_s, jnp.float32), jnp.asarray(nom_u, jnp.float32),
                jnp.asarray(ref_s, jnp.float32), jnp.asarray(ref_us, jnp.float32),
                pts, vels, mask, planner.pan_state,
                collision_threshold=0.5)
            if float(loss) > 0:
                planner.set_adjust_parameters(tuner.update(planner.adjust, grads))
            losses.append(float(loss))

        env.step(action)
        if env.collided:
            break
    return losses


if __name__ == "__main__":
    base = os.path.join(REPO, "examples", "corridor", "diff")
    planner = NeuPan.init_from_yaml(os.path.join(base, "planner.yaml"))
    tuner = LONTuner(planner.adjust, lr=5e-3)

    for epoch in range(EPOCHS):
        losses = run_episode(planner, tuner, base)
        adj = planner.adjust
        print(f"epoch {epoch}: steps={len(losses)} "
              f"mean_loss={np.mean(losses) if losses else 0:.3f} "
              f"p_u={float(adj.p_u):.3f} eta={float(adj.eta):.3f} "
              f"d_max={float(adj.d_max):.3f}")
