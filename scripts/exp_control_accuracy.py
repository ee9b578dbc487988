"""Control-accuracy evidence on REAL planner instances.

Drives the corridor/diff scenario closed-loop with the trained DUNE
checkpoint; at every control tick rebuilds the first-PAN-iteration QP
exactly as the planner assembled it and compares our ADMM+polish solution
against a float64 scipy trust-constr oracle of the same problem (hinge
penalty written directly in the objective, hard rows as constraints).

Healthy output: max |u - u_oracle| on the commanded first control <= 1e-3
across the episode, KKT errors ~1e-5.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from scipy.optimize import LinearConstraint, minimize

from neupan_tpu.planner import NeuPan
from neupan_tpu.sim.env_loader import load_env
from neupan_tpu.ops.dune import dune_forward, generate_point_flow
from neupan_tpu.ops.nrmp import coefficients_from_dune, build_qp, unpack_solution
from neupan_tpu.ops.qp import solve_qp, kkt_error

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def scipy_soft_oracle(qp):
    """f64 oracle: soft rows as one-sided quadratic penalty in the objective."""
    P, q, A, l, u = [np.asarray(v, np.float64) for v in
                     (qp.P_diag, qp.q, qp.A, qp.l, qp.u)]
    soft = np.zeros_like(l) if qp.soft is None else np.asarray(qp.soft, np.float64)
    hard = soft <= 0
    Ah, lh, uh = A[hard], l[hard], u[hard]
    As, ls, ws = A[~hard], l[~hard], soft[~hard]
    n = P.shape[0]

    def f(x):
        r = np.minimum(As @ x - ls, 0.0)
        return 0.5 * x @ (P * x) + q @ x + 0.5 * np.sum(ws * r * r)

    def grad(x):
        r = np.minimum(As @ x - ls, 0.0)
        return P * x + q + As.T @ (ws * r)

    def hess(x):
        act = (As @ x - ls) < 0.0
        Aw = As * (ws * act)[:, None]
        return np.diag(P) + Aw.T @ As

    res = minimize(f, np.zeros(n), jac=grad, hess=hess,
                   method="trust-constr",
                   constraints=[LinearConstraint(Ah, lh, uh)],
                   options={"gtol": 1e-10, "xtol": 1e-12, "maxiter": 5000})
    return res.x


def qp_objective(qp, x):
    """Full objective incl. the one-sided penalty, in float64."""
    P, q, A, l = [np.asarray(v, np.float64) for v in
                  (qp.P_diag, qp.q, qp.A, qp.l)]
    soft = np.zeros_like(l) if qp.soft is None else np.asarray(qp.soft,
                                                               np.float64)
    x = np.asarray(x, np.float64)
    r = np.minimum(A @ x - l, 0.0) * (soft > 0)
    return 0.5 * x @ (P * x) + q @ x + 0.5 * np.sum(soft * r * r)


def hard_violation(qp, x):
    P, A, l, u = [np.asarray(v, np.float64) for v in
                  (qp.P_diag, qp.A, qp.l, qp.u)]
    soft = np.zeros_like(l) if qp.soft is None else np.asarray(qp.soft,
                                                               np.float64)
    Ax = A @ np.asarray(x, np.float64)
    v = np.maximum(np.maximum(Ax - u, l - Ax), 0.0)
    return float(np.max(v * (soft <= 0)))


def main():
    # SCENARIO overrides the episode (e.g. corridor_long/diff for the
    # T=30 long-horizon contract, VERDICT round-4 #5)
    base = os.path.join(REPO, "examples",
                        os.environ.get("SCENARIO", "corridor/diff"))
    from neupan_tpu.config import load_planner_config

    cfg = load_planner_config(os.path.join(base, "planner.yaml"))
    # ADMM_ITERS / ADMM_JSON env override the solver config so the SAME
    # contract can qualify alternate bench configs (e.g. a cheap-iteration
    # + multi-round-polish fast path) — the bench must only ever publish a
    # config that PASSes here.
    admm = dict(cfg["pan_kwargs"].get("admm") or {})
    if os.environ.get("ADMM_ITERS"):
        admm["iters"] = int(os.environ["ADMM_ITERS"])
    if os.environ.get("ADMM_JSON"):
        import json

        admm.update(json.loads(os.environ["ADMM_JSON"]))
    if admm:
        cfg["pan_kwargs"]["admm"] = admm
        print(f"ADMM override: {admm}")
    planner = NeuPan(**cfg)
    env = load_env(os.path.join(base, "env.yaml"), planner.robot)
    spec = planner.spec

    max_steps = int(os.environ.get("STEPS", "210"))
    check_every = int(os.environ.get("EVERY", "10"))
    u_errs, kkts, gaps, viols = [], [], [], []
    for i in range(max_steps):
        state = env.get_robot_state()
        scan = env.get_lidar_scan()
        pts_np = planner.scan_to_point(state, scan)

        # mirror planner.forward's ordering: arrival check precedes the
        # nominal/reference generation (the path state machine advances here)
        if planner.ipath.check_arrive(state):
            print(f"arrived at step {i}")
            break

        if i % check_every == 0:
            nom_s, nom_u, ref_s, ref_us = planner.ipath.generate_nom_ref_state(
                state, planner.cur_vel_array, planner.ref_speed)
            pts, vels, mask = planner._pad_points(pts_np, None)
            nom_s_j = jnp.asarray(nom_s, jnp.float32)
            pf, R_all, glob = generate_point_flow(nom_s_j, pts, vels,
                                                  spec.robot.dt)
            vertices = (jnp.asarray(spec.robot.vertices, jnp.float32)
                        if spec.dune_select == "exact" else None)
            dune = dune_forward(planner.dune_params, planner.G, planner.h,
                                pf, R_all, glob, mask, spec.nrmp.K,
                                select=spec.dune_select, vertices=vertices)
            fa, fb = coefficients_from_dune(
                spec.nrmp, dune.mu_k, dune.lam_k, dune.points_k,
                dune.valid_k, planner.h, jnp.any(mask))
            A_dyn, B_dyn, C_dyn = spec.robot.linearize(
                nom_s_j, jnp.asarray(nom_u, jnp.float32))
            qp = build_qp(spec.nrmp, planner.adjust, nom_s_j,
                          jnp.asarray(nom_u, jnp.float32),
                          jnp.asarray(ref_s, jnp.float32),
                          jnp.asarray(ref_us, jnp.float32),
                          A_dyn, B_dyn, C_dyn, fa, fb)
            sol = solve_qp(qp, spec.admm)
            # the deployed path: warm-started from the previous tick
            sol_w = solve_qp(qp, spec.admm,
                             planner.pan_state.x_warm, planner.pan_state.y_warm)
            x_ref = scipy_soft_oracle(qp)
            _, u_ours, _ = unpack_solution(spec.nrmp, sol.x)
            _, u_warm, _ = unpack_solution(spec.nrmp, sol_w.x)
            _, u_ref, _ = unpack_solution(spec.nrmp,
                                          jnp.asarray(x_ref, jnp.float32))
            du = float(np.abs(np.asarray(u_ours)[:, 0] -
                              np.asarray(u_ref)[:, 0]).max())
            duw = float(np.abs(np.asarray(u_warm)[:, 0] -
                               np.asarray(u_ref)[:, 0]).max())
            kk = float(kkt_error(qp.P_diag, qp.q, qp.A, qp.l, qp.u,
                                 sol.x, sol.y, qp.soft))
            kkw = float(kkt_error(qp.P_diag, qp.q, qp.A, qp.l, qp.u,
                                  sol_w.x, sol_w.y, qp.soft))
            # the decisive optimality measure: objective gap vs the f64
            # oracle (action distance is meaningless on near-degenerate
            # instances — two optimal solvers can disagree by ~1e-2 there)
            f_ref = qp_objective(qp, x_ref)
            gap = (qp_objective(qp, np.asarray(sol_w.x)) - f_ref) / (
                1.0 + abs(f_ref))
            viol = hard_violation(qp, np.asarray(sol_w.x))
            u_errs.append(duw)
            kkts.append(kkw)
            gaps.append(gap)
            viols.append(viol)
            print(f"step {i:3d}: cold |du0|={du:.2e} kkt={kk:.2e}   "
                  f"warm |du0|={duw:.2e} kkt={kkw:.2e} "
                  f"obj_gap={gap:+.2e} viol={viol:.1e}", flush=True)
            if duw > 1e-3 and os.environ.get("DUMP"):
                np.savez(f"/tmp/bad_qp_step{i}.npz",
                         P=np.asarray(qp.P_diag), q=np.asarray(qp.q),
                         A=np.asarray(qp.A), l=np.asarray(qp.l),
                         u=np.asarray(qp.u), soft=np.asarray(qp.soft),
                         x_warm=np.asarray(planner.pan_state.x_warm),
                         y_warm=np.asarray(planner.pan_state.y_warm),
                         x_ref=x_ref)

        action, info = planner(state, pts_np)
        if info["arrive"]:
            print(f"arrived at step {i}")
            break
        env.step(action)

    print(f"\nsummary (warm-started, the deployed path) over {len(u_errs)} "
          f"checked steps:\n"
          f"  |du0|   max={max(u_errs):.2e} p50={np.median(u_errs):.2e}\n"
          f"  kkt     max={max(kkts):.2e} p50={np.median(kkts):.2e}\n"
          f"  obj_gap max={max(gaps):+.2e} p50={np.median(gaps):+.2e}\n"
          f"  hard-constraint violation max={max(viols):.2e}")
    ok = max(gaps) <= 1e-4 and max(viols) <= 2e-3
    print(("PASS" if ok else "FAIL") +
          ": optimality contract = relative objective gap <= 1e-4 vs f64 "
          "oracle AND hard feasibility <= 2e-3 on every checked step "
          "(action distance is reported but not asserted: NRMP optima can "
          "sit on shallow faces)")


if __name__ == "__main__":
    main()
