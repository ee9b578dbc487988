"""Dissect the first diverging corridor QP (step 21): oracle vs budgets,
polish selection internals."""
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

import dataclasses  # noqa: E402

from neupan_tpu.sim.env_loader import load_env  # noqa: E402
from neupan_tpu.ops.dune import dune_forward, generate_point_flow  # noqa: E402
from neupan_tpu.ops.nrmp import coefficients_from_dune, build_qp, unpack_solution  # noqa: E402
from neupan_tpu.ops import qp as qp_mod  # noqa: E402
from neupan_tpu.ops.qp import solve_qp, kkt_error  # noqa: E402
from scripts.exp_divergence import make  # noqa: E402

STEP = int(os.environ.get("STEP", "21"))

planner, base = make(300)
env = load_env(os.path.join(base, "env.yaml"), planner.robot)

for i in range(STEP):
    state = env.get_robot_state()
    pts = planner.scan_to_point(state, env.get_lidar_scan())
    action, info = planner(state, pts)
    env.step(action)

state = env.get_robot_state()
pts_np = planner.scan_to_point(state, env.get_lidar_scan())
nom_s, nom_u, ref_s, ref_us = planner.ipath.generate_nom_ref_state(
    state, planner.cur_vel_array, planner.ref_speed)
pts, vels, mask = planner._pad_points(pts_np, None)
spec = planner.spec

# one PAN iteration's QP with the warm state the planner would use
pf, R_all, glob = generate_point_flow(jnp.asarray(nom_s, jnp.float32), pts, vels,
                                      spec.robot.dt)
vertices = (jnp.asarray(spec.robot.vertices, jnp.float32)
            if spec.dune_select == "exact" else None)
dune = dune_forward(planner.dune_params, planner.G, planner.h, pf, R_all, glob,
                    mask, spec.nrmp.K, select=spec.dune_select,
                    vertices=vertices)
fa, fb = coefficients_from_dune(spec.nrmp, dune.mu_k, dune.lam_k, dune.points_k,
                                dune.valid_k, planner.h, jnp.any(mask))
A_dyn, B_dyn, C_dyn = spec.robot.linearize(
    jnp.asarray(nom_s, jnp.float32), jnp.asarray(nom_u, jnp.float32))
qp = build_qp(spec.nrmp, planner.adjust, jnp.asarray(nom_s, jnp.float32),
              jnp.asarray(nom_u, jnp.float32), jnp.asarray(ref_s, jnp.float32),
              jnp.asarray(ref_us, jnp.float32), A_dyn, B_dyn, C_dyn, fa, fb)
x_w, y_w = planner.pan_state.x_warm, planner.pan_state.y_warm

from scripts.exp_control_accuracy import scipy_soft_oracle  # noqa: E402
x_ref = np.asarray(scipy_soft_oracle(qp))
_, u_ref, _ = unpack_solution(spec.nrmp, jnp.asarray(x_ref, jnp.float32))
print("oracle u0:", np.asarray(u_ref)[:, 0])

for iters in (150, 300, 600):
    cfg = dataclasses.replace(spec.admm, iters=iters)
    with jax.default_matmul_precision("highest"):
        x, y, z, rp, rd = qp_mod._admm_core(qp, cfg, x_w, y_w)
        e0 = kkt_error(qp.P_diag, qp.q, qp.A, *qp_mod._clip_bounds(qp.l, qp.u),
                       x, y, qp.soft)
        xo, yo, _, _, polished = qp_mod._polish(qp, cfg, x, y)
        ep = kkt_error(qp.P_diag, qp.q, qp.A, *qp_mod._clip_bounds(qp.l, qp.u),
                       xo, yo, qp.soft)
    _, u_raw, _ = unpack_solution(spec.nrmp, x)
    _, u_pol, _ = unpack_solution(spec.nrmp, xo)
    du_raw = np.abs(np.asarray(u_raw)[:, 0] - np.asarray(u_ref)[:, 0]).max()
    du_pol = np.abs(np.asarray(u_pol)[:, 0] - np.asarray(u_ref)[:, 0]).max()
    print(f"iters={iters}: e0={float(e0):.2e} ep={float(ep):.2e} "
          f"polished={bool(polished)} |u0_raw-oracle|={du_raw:.2e} "
          f"|u0_pol-oracle|={du_pol:.2e} u0_pol={np.asarray(u_pol)[:,0]}")
np.savez("/tmp/step_qp.npz", P=np.asarray(qp.P_diag, np.float64),
         q=np.asarray(qp.q, np.float64), A=np.asarray(qp.A, np.float64),
         l=np.asarray(qp.l, np.float64), u=np.asarray(qp.u, np.float64),
         soft=np.asarray(qp.soft, np.float64),
         x_warm=np.asarray(x_w), y_warm=np.asarray(y_w), x_ref=x_ref)
print("dumped /tmp/step_qp.npz")
