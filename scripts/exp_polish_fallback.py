"""Which corridor steps ship the raw ADMM iterate (polish margin fallback)?

For each closed-loop step, re-run the first PAN iteration's QP solve with
the planner's live warm state and record whether the polish replaced the
iterate and the final KKT error.  Steps where `polished` is False ship a
budget-dependent (non-converged) solution — the round-3 chaos suspects.
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
from neupan_tpu.ops import qp as qp_mod  # noqa: E402
from neupan_tpu.ops.qp import kkt_error  # noqa: E402
from scripts.exp_divergence import make  # noqa: E402


def dissect_qp(planner, state, pts_np):
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
    qp = build_qp(spec.nrmp, planner.adjust, jnp.asarray(nom_s, jnp.float32),
                  jnp.asarray(nom_u, jnp.float32),
                  jnp.asarray(ref_s, jnp.float32),
                  jnp.asarray(ref_us, jnp.float32), A_dyn, B_dyn, C_dyn,
                  fa, fb)
    with jax.default_matmul_precision("highest"):
        x, y, z, rp, rd = qp_mod._admm_core(qp, spec.admm,
                                            planner.pan_state.x_warm,
                                            planner.pan_state.y_warm)
        lb, ub = qp_mod._clip_bounds(qp.l, qp.u)
        e0 = kkt_error(qp.P_diag, qp.q, qp.A, lb, ub, x, y, qp.soft)
        xo, yo, _, _, polished = qp_mod._polish(qp, spec.admm, x, y)
        ep = kkt_error(qp.P_diag, qp.q, qp.A, lb, ub, xo, yo, qp.soft)
    return float(e0), float(ep), bool(polished)


def main(max_steps=240):
    planner, base = make(300)
    env = load_env(os.path.join(base, "env.yaml"), planner.robot)
    rows = []
    for i in range(max_steps):
        state = env.get_robot_state()
        pts_np = planner.scan_to_point(state, env.get_lidar_scan())
        e0, ep, polished = dissect_qp(planner, state, pts_np)
        rows.append((i, e0, ep, polished))
        action, info = planner(state, pts_np)
        if info["arrive"]:
            break
        env.step(action)

    nofire = [r for r in rows if not r[3]]
    bad = [r for r in rows if r[2] > 1e-3]
    print(f"{len(rows)} steps; polish fallback on {len(nofire)}; "
          f"final kkt>1e-3 on {len(bad)}")
    for i, e0, ep, p in rows:
        if not p or ep > 1e-3:
            print(f"  step {i:3d}: e0={e0:.2e} ep={ep:.2e} polished={p}")


if __name__ == "__main__":
    main()
