"""LON variant 02: composite loss (state MSE + speed MSE + distance loss)
with stuck detection, at a coarser control period (step_time 0.2).

Parity with the reference example/LON/LON_corridor_02.py: the robot is
"stuck" when its position moves less than ``stuck_threshold`` for more than
``stuck_count_threshold`` consecutive steps; the distance loss then switches
to the 50 + sum(d) branch, pushing the tuned parameters away from
over-conservative settings.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("NEUPAN_PLATFORM", "cpu")  # hard-set: ambient axon otherwise leaks in (docs/AXON_DISPATCH.md)
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from neupan_tpu.lon import LONTuner, distance_loss, step_loss_and_grad, tracking_losses  # noqa: E402
from neupan_tpu.planner import NeuPan  # noqa: E402
from neupan_tpu.sim.env_loader import load_env  # noqa: E402

EPOCHS = int(os.environ.get("LON_EPOCHS", "3"))
MAX_STEPS = int(os.environ.get("LON_MAX_STEPS", "120"))
STUCK_THRESHOLD = 0.01
STUCK_COUNT_THRESHOLD = 5


def composite_loss(out, ref_s, ref_us, stuck):
    """Module-level (stable) loss so step_loss_and_grad's jit cache hits:
    state MSE + speed MSE + distance loss with the stuck branch."""
    state_loss, speed_loss = tracking_losses(out, ref_s, ref_us)
    d_loss = distance_loss(out.opt_d, out.min_distance,
                           collision_threshold=0.5, stuck=stuck)
    return state_loss + speed_loss + d_loss


def run_episode(planner, tuner, base):
    env = load_env(os.path.join(base, "env.yaml"), planner.robot)
    planner.reset()
    losses = []
    stuck_count = 0
    for _ in range(MAX_STEPS):
        state = env.get_robot_state()
        scan = env.get_lidar_scan()
        points = planner.scan_to_point(state, scan)

        action, info = planner(state, points)
        if info["arrive"]:
            break

        pre_position = env.get_robot_state()[0:2]
        env.step(action)
        moved = float(np.linalg.norm(env.get_robot_state()[0:2] - pre_position))
        stuck_count = stuck_count + 1 if moved < STUCK_THRESHOLD else 0
        stuck = stuck_count > STUCK_COUNT_THRESHOLD

        if points is not None:
            nom_s, nom_u, ref_s, ref_us = planner.ipath.generate_nom_ref_state(
                state, planner.cur_vel_array, planner.ref_speed)
            pts, vels, mask = planner._pad_points(points, None)
            ref_s_j = jnp.asarray(ref_s, jnp.float32)
            ref_us_j = jnp.asarray(ref_us, jnp.float32)

            loss, grads, _ = step_loss_and_grad(
                planner.spec, planner.dune_params, planner.G, planner.h,
                planner.adjust,
                jnp.asarray(nom_s, jnp.float32), jnp.asarray(nom_u, jnp.float32),
                ref_s_j, ref_us_j, pts, vels, mask, planner.pan_state,
                loss_fn=composite_loss, stuck=stuck)
            planner.set_adjust_parameters(tuner.update(planner.adjust, grads))
            losses.append(float(loss))

        if env.collided or stuck:
            break
    return losses


def _composite_info_loss(info, planner):
    """The composite loss computed from planner outputs (no gradients),
    for the fixed-semantics before/after evaluation."""
    state_loss = float(jnp.mean(
        (info["state_tensor"] - info["ref_state_tensor"]) ** 2))
    speed_loss = float(jnp.mean(
        (info["vel_tensor"][0, :] - info["ref_speed_tensor"]) ** 2))
    d_loss = float(distance_loss(
        info["distance_tensor"], jnp.asarray(planner.min_distance),
        collision_threshold=0.5))
    return state_loss + speed_loss + d_loss


if __name__ == "__main__":
    from LON_corridor import eval_episode

    here = os.path.dirname(os.path.abspath(__file__))
    planner = NeuPan.init_from_yaml(os.path.join(here, "planner_02.yaml"))
    # LON owns the stuck behavior through its loss (reference
    # example/LON/LON_corridor.py:10-19); the planner's built-in deadlock
    # escape would fight the tuner (its temporary eta/d_max boost leaks
    # into the recorded trajectories), so it is off during tuning.
    planner.stuck_enabled = False
    tuner = LONTuner(planner.adjust, lr=5e-3)
    base = os.path.join(REPO, "examples", "corridor", "diff")

    save = os.environ.get("LON_SAVE")

    def emit(line):
        print(line, flush=True)
        if save:
            with open(save, "a") as f:
                print(line, file=f)

    base_eval = eval_episode(planner, base, info_loss=_composite_info_loss)
    emit(f"BASELINE (untuned): {base_eval}")

    for epoch in range(EPOCHS):
        losses = run_episode(planner, tuner, base)
        adj = planner.adjust
        line = (f"epoch {epoch}: steps={len(losses)} "
                f"episode_loss={np.sum(losses) if losses else 0:.3f} "
                f"mean_loss={np.mean(losses) if losses else 0:.4f} "
                f"p_u={float(adj.p_u):.4f} eta={float(adj.eta):.4f} "
                f"d_max={float(adj.d_max):.4f}")
        emit(line)

    final_eval = eval_episode(planner, base, info_loss=_composite_info_loss)
    emit(f"FINAL (tuned, frozen): {final_eval}")
    improved = (final_eval["mean_step_loss"] <= base_eval["mean_step_loss"]
                and not final_eval["collided"]
                and final_eval["steps_to_arrive"] is not None)
    emit(f"IMPROVED: {improved} (mean_step_loss "
         f"{base_eval['mean_step_loss']:.3f} -> "
         f"{final_eval['mean_step_loss']:.3f}, min_clearance "
         f"{base_eval['min_clearance']:.3f} -> "
         f"{final_eval['min_clearance']:.3f}, steps_to_arrive "
         f"{base_eval['steps_to_arrive']} -> "
         f"{final_eval['steps_to_arrive']})")
