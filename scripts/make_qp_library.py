"""Record the corridor/diff episode's QP instance stream to disk.

Produces /tmp/qp_library.npz: every first-PAN-iteration QP of (a) the
arriving 300-iteration episode and (b) the deadlocking 150-iteration
episode, with the planner's live warm starts and a float64 scipy oracle
solution per instance.  This is the test bed for round-3 solver work: a
solver change is good iff it reaches KKT<=tol on these instances in fewer
effective iterations.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

from neupan_tpu.sim.env_loader import load_env  # noqa: E402
from neupan_tpu.ops.dune import dune_forward, generate_point_flow  # noqa: E402
from neupan_tpu.ops.nrmp import coefficients_from_dune, build_qp  # noqa: E402
from scripts.exp_divergence import make  # noqa: E402
from scripts.exp_control_accuracy import scipy_soft_oracle  # noqa: E402


def build_step_qp(planner, state, pts_np):
    spec = planner.spec
    nom_s, nom_u, ref_s, ref_us = planner.ipath.generate_nom_ref_state(
        state, planner.cur_vel_array, planner.ref_speed)
    pts, vels, mask = planner._pad_points(pts_np, None)
    pf, R_all, glob = generate_point_flow(jnp.asarray(nom_s, jnp.float32),
                                          pts, vels, spec.robot.dt)
    vertices = (jnp.asarray(spec.robot.vertices, jnp.float32)
                if spec.dune_select == "exact" else None)
    dune = dune_forward(planner.dune_params, planner.G, planner.h, pf, R_all,
                        glob, mask, spec.nrmp.K, select=spec.dune_select,
                        vertices=vertices)
    fa, fb = coefficients_from_dune(spec.nrmp, dune.mu_k, dune.lam_k,
                                    dune.points_k, dune.valid_k, planner.h,
                                    jnp.any(mask))
    A_dyn, B_dyn, C_dyn = spec.robot.linearize(
        jnp.asarray(nom_s, jnp.float32), jnp.asarray(nom_u, jnp.float32))
    return build_qp(spec.nrmp, planner.adjust, jnp.asarray(nom_s, jnp.float32),
                    jnp.asarray(nom_u, jnp.float32),
                    jnp.asarray(ref_s, jnp.float32),
                    jnp.asarray(ref_us, jnp.float32), A_dyn, B_dyn, C_dyn,
                    fa, fb)


def record(iters, max_steps, tag, every=1):
    planner, base = make(iters)
    env = load_env(os.path.join(base, "env.yaml"), planner.robot)
    rows = []
    for i in range(max_steps):
        state = env.get_robot_state()
        pts_np = planner.scan_to_point(state, env.get_lidar_scan())
        if planner.ipath.check_arrive(state):
            break
        if i % every == 0:
            qp = build_step_qp(planner, state, pts_np)
            rows.append(dict(
                step=i, tag=tag,
                P=np.asarray(qp.P_diag, np.float64),
                q=np.asarray(qp.q, np.float64),
                A=np.asarray(qp.A, np.float64),
                l=np.asarray(qp.l, np.float64),
                u=np.asarray(qp.u, np.float64),
                soft=np.asarray(qp.soft, np.float64),
                x_warm=np.asarray(planner.pan_state.x_warm, np.float64),
                y_warm=np.asarray(planner.pan_state.y_warm, np.float64),
            ))
        action, info = planner(state, pts_np)
        if info["arrive"]:
            break
        env.step(action)
    print(f"{tag}: recorded {len(rows)} instances", flush=True)
    return rows


def main():
    every = int(os.environ.get("EVERY", "2"))
    rows = record(300, 240, "arrive300", every=every)
    rows += record(150, 160, "stuck150", every=every)

    # f64 oracle for each instance
    import time
    t0 = time.time()
    for k, r in enumerate(rows):
        class QPLike:
            P_diag, q, A, l, u, soft = (r["P"], r["q"], r["A"], r["l"],
                                        r["u"], r["soft"])
        r["x_ref"] = scipy_soft_oracle(QPLike)
        if k % 20 == 0:
            print(f"oracle {k}/{len(rows)} ({time.time()-t0:.0f}s)", flush=True)

    out = {f"{i}_{key}": r[key] for i, r in enumerate(rows)
           for key in ("P", "q", "A", "l", "u", "soft", "x_warm", "y_warm",
                       "x_ref")}
    out["n_instances"] = np.asarray(len(rows))
    out["steps"] = np.asarray([r["step"] for r in rows])
    out["tags"] = np.asarray([r["tag"] for r in rows])
    np.savez_compressed("/tmp/qp_library.npz", **out)
    print(f"wrote /tmp/qp_library.npz with {len(rows)} instances")


if __name__ == "__main__":
    main()
