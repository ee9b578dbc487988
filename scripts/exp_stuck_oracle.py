"""At the corridor stuck state: compare our NRMP solve vs scipy oracle."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_default_matmul_precision", "highest")

import run_exp
from neupan_tpu.planner import NeuPan
from neupan_tpu.sim.env_loader import load_env
from neupan_tpu.ops.dune import dune_forward, generate_point_flow
from neupan_tpu.ops.nrmp import coefficients_from_dune, build_qp, unpack_solution
from neupan_tpu.ops.qp import solve_qp, kkt_error

base = "/root/repo/examples/corridor/diff"
planner = NeuPan.init_from_yaml(os.path.join(base, "planner.yaml"))
env = load_env(os.path.join(base, "env.yaml"), planner.robot)

# drive to the stuck point
hist = []
for i in range(140):
    state = env.get_robot_state()
    scan = env.get_lidar_scan()
    pts = planner.scan_to_point(state, scan)
    action, info = planner(state, pts)
    hist.append((state.copy(), action.copy(), planner.min_distance))
    if info["arrive"]:
        break
    env.step(action)

state, action, md = hist[-1]
print(f"final pos=({state[0,0]:.2f},{state[1,0]:.2f}) action={action.ravel()} min_dist={md:.4f}")

# rebuild this step's QP and compare with scipy
scan = env.get_lidar_scan()
pts_np = planner.scan_to_point(state, scan)
nom_s, nom_u, ref_s, ref_us = planner.ipath.generate_nom_ref_state(
    state, planner.cur_vel_array, planner.ref_speed)
pts, vels, mask = planner._pad_points(pts_np, None)

spec = planner.spec
pf, R_all, glob = generate_point_flow(jnp.asarray(nom_s, jnp.float32), pts, vels, spec.robot.dt)
vertices = (jnp.asarray(spec.robot.vertices, jnp.float32)
            if spec.dune_select == "exact" else None)
dune = dune_forward(planner.dune_params, planner.G, planner.h, pf, R_all, glob,
                    mask, spec.nrmp.K, select=spec.dune_select, vertices=vertices)
fa, fb = coefficients_from_dune(spec.nrmp, dune.mu_k, dune.lam_k, dune.points_k,
                                dune.valid_k, planner.h, jnp.any(mask))
A_dyn, B_dyn, C_dyn = spec.robot.linearize(jnp.asarray(nom_s, jnp.float32), jnp.asarray(nom_u, jnp.float32))
qp = build_qp(spec.nrmp, planner.adjust, jnp.asarray(nom_s, jnp.float32),
              jnp.asarray(nom_u, jnp.float32), jnp.asarray(ref_s, jnp.float32),
              jnp.asarray(ref_us, jnp.float32), A_dyn, B_dyn, C_dyn, fa, fb)
sol = solve_qp(qp, spec.admm)
s_o, u_o, d_o = unpack_solution(spec.nrmp, sol.x)
print("our u[:, :3]:", np.asarray(u_o)[:, :3])
print("our d:", np.round(np.asarray(d_o), 3))
print("rp/rd:", float(sol.r_prim), float(sol.r_dual))

# scipy oracle on the same problem (soft rows as penalty objective)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_control_accuracy import scipy_soft_oracle

x_ref = scipy_soft_oracle(qp)
s_r, u_r, d_r = unpack_solution(spec.nrmp, jnp.asarray(x_ref, jnp.float32))
print("oracle u[:, :3]:", np.asarray(u_r)[:, :3])
print("max |u diff|:", np.abs(np.asarray(u_o)-np.asarray(u_r)).max())
print("max |s diff|:", np.abs(np.asarray(s_o)-np.asarray(s_r)).max())

# dump the hard instance for offline solver experiments
P, q, A, l, u = [np.asarray(v, np.float64)
                 for v in (qp.P_diag, qp.q, qp.A, qp.l, qp.u)]
np.savez("/tmp/hard_qp.npz", P=P, q=q, A=A, l=l, u=u,
         soft=np.zeros_like(l) if qp.soft is None else np.asarray(qp.soft),
         x_warm=np.asarray(planner.pan_state.x_warm),
         y_warm=np.asarray(planner.pan_state.y_warm))
print("dumped /tmp/hard_qp.npz")
