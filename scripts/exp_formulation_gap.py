"""Formulation gap: shipped (regularized) solve vs the REFERENCE problem.

VERDICT round-3 item #3.  The shipped NRMP adds reg_u/reg_d proximal/ridge
terms to the reference objective (NRMPSpec.reg_u — the reference's own
proximal covers s only, reference robot/robot.py:172-180).  The optimality
contract (exp_control_accuracy.py) certifies our solver against an oracle
of the REGULARIZED problem; this script closes the remaining gap by
measuring, on the real corridor/diff episode,

    |u0_shipped  -  u0_oracle(reg_u = reg_d = 0)|

i.e. the commanded action of the deployed path against a float64
trust-constr oracle of the reference's EXACT formulation, plus the pure
formulation shift |u0_oracle(reg) - u0_oracle(0)| that isolates how much
of the distance is the regularization itself vs solver error.

Output: a distribution summary + two explicit gates:

  * optimality gate — the shipped point must be epsilon-optimal for the
    REFERENCE objective (reg=0): relative objective gap <= 1e-4 and hard
    feasibility <= 2e-3 on every checked step;
  * action gate — |u0_shipped - u0_oracle(reg=0)| p90 <= 1e-2 (the
    round-5 target; the original BASELINE.json ambition is 1e-3).  The
    face-diameter probe (round 4) showed the reference problem determines
    u0 to ~5e-4, so the action distance is a REAL formulation-induced
    deviation that shrinks ~linearly with reg_u/reg_d — run the reg
    ladder with NEUPAN_NRMP_JSON='{"reg_u": ..., "reg_d": ...}' to find
    the smallest reg the solver still converges at.
"""
import dataclasses
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from neupan_tpu.config import load_planner_config
from neupan_tpu.ops.dune import dune_forward, generate_point_flow
from neupan_tpu.ops.nrmp import (build_qp, coefficients_from_dune,
                                 unpack_solution)
from neupan_tpu.ops.qp import solve_qp
from neupan_tpu.planner import NeuPan
from neupan_tpu.sim.env_loader import load_env
from scripts.exp_control_accuracy import (hard_violation, qp_objective,
                                          scipy_soft_oracle)


def scipy_soft_oracle_from(qp, x0):
    """Same trust-constr oracle but warm-started from x0 (multi-start
    probe: two exact solvers of a degenerate problem land on different
    optimal-face points; their distance measures the face diameter)."""
    from scipy.optimize import LinearConstraint, minimize

    P, q, A, l, u = [np.asarray(v, np.float64) for v in
                     (qp.P_diag, qp.q, qp.A, qp.l, qp.u)]
    soft = np.zeros_like(l) if qp.soft is None else np.asarray(qp.soft,
                                                               np.float64)
    hard = soft <= 0
    Ah, lh, uh = A[hard], l[hard], u[hard]
    As, ls, ws = A[~hard], l[~hard], soft[~hard]

    def f(x):
        r = np.minimum(As @ x - ls, 0.0)
        return 0.5 * x @ (P * x) + q @ x + 0.5 * np.sum(ws * r * r)

    def grad(x):
        r = np.minimum(As @ x - ls, 0.0)
        return P * x + q + As.T @ (ws * r)

    res = minimize(f, np.asarray(x0, np.float64), jac=grad,
                   method="trust-constr",
                   constraints=[LinearConstraint(Ah, lh, uh)],
                   options={"gtol": 1e-10, "xtol": 1e-12, "maxiter": 5000})
    return res.x


def build_step_qps(planner, state, pts_np):
    """(regularized qp, reg0 qp) for the current planner state."""
    spec = planner.spec
    nom_s, nom_u, ref_s, ref_us = planner.ipath.generate_nom_ref_state(
        state, planner.cur_vel_array, planner.ref_speed)
    pts, vels, mask = planner._pad_points(pts_np, None)
    nom_s_j = jnp.asarray(nom_s, jnp.float32)
    nom_u_j = jnp.asarray(nom_u, jnp.float32)
    pf, R_all, glob = generate_point_flow(nom_s_j, pts, vels, spec.robot.dt)
    vertices = (jnp.asarray(spec.robot.vertices, jnp.float32)
                if spec.dune_select == "exact" else None)
    dune = dune_forward(planner.dune_params, planner.G, planner.h, pf, R_all,
                        glob, mask, spec.nrmp.K, select=spec.dune_select,
                        vertices=vertices)
    fa, fb = coefficients_from_dune(spec.nrmp, dune.mu_k, dune.lam_k,
                                    dune.points_k, dune.valid_k, planner.h,
                                    jnp.any(mask))
    A_dyn, B_dyn, C_dyn = spec.robot.linearize(nom_s_j, nom_u_j)
    args = (nom_s_j, nom_u_j, jnp.asarray(ref_s, jnp.float32),
            jnp.asarray(ref_us, jnp.float32), A_dyn, B_dyn, C_dyn, fa, fb)
    qp_reg = build_qp(spec.nrmp, planner.adjust, *args)
    nrmp0 = dataclasses.replace(spec.nrmp, reg_u=0.0, reg_d=0.0)
    qp_ref = build_qp(nrmp0, planner.adjust, *args)
    return qp_reg, qp_ref


def main():
    base = os.path.join(REPO, "examples/corridor/diff")
    cfg = load_planner_config(os.path.join(base, "planner.yaml"))
    planner = NeuPan(**cfg)
    env = load_env(os.path.join(base, "env.yaml"), planner.robot)
    spec = planner.spec

    max_steps = int(os.environ.get("STEPS", "210"))
    check_every = int(os.environ.get("EVERY", "5"))
    d_ship, d_form, d_face, gaps0, viols0 = [], [], [], [], []
    for i in range(max_steps):
        state = env.get_robot_state()
        scan = env.get_lidar_scan()
        pts_np = planner.scan_to_point(state, scan)
        if planner.ipath.check_arrive(state):
            print(f"arrived at step {i}")
            break

        if i % check_every == 0:
            qp_reg, qp_ref = build_step_qps(planner, state, pts_np)
            # deployed path: our solver, warm-started, regularized problem
            sol = solve_qp(qp_reg, spec.admm,
                           planner.pan_state.x_warm, planner.pan_state.y_warm)
            _, u_ship, _ = unpack_solution(spec.nrmp, sol.x)
            # f64 oracles of both formulations
            x_ref0 = scipy_soft_oracle(qp_ref)     # the REFERENCE problem
            x_refr = scipy_soft_oracle(qp_reg)
            _, u_ref0, _ = unpack_solution(spec.nrmp,
                                           jnp.asarray(x_ref0, jnp.float32))
            _, u_refr, _ = unpack_solution(spec.nrmp,
                                           jnp.asarray(x_refr, jnp.float32))
            a = float(np.abs(np.asarray(u_ship)[:, 0]
                             - np.asarray(u_ref0)[:, 0]).max())
            b = float(np.abs(np.asarray(u_refr)[:, 0]
                             - np.asarray(u_ref0)[:, 0]).max())
            d_ship.append(a)
            d_form.append(b)
            # the decisive certification: is the SHIPPED point epsilon-
            # optimal FOR THE REFERENCE OBJECTIVE (reg = 0)?
            f0_ref = qp_objective(qp_ref, x_ref0)
            gap0 = (qp_objective(qp_ref, np.asarray(sol.x)) - f0_ref) / (
                1.0 + abs(f0_ref))
            viol0 = hard_violation(qp_ref, np.asarray(sol.x))
            gaps0.append(gap0)
            viols0.append(viol0)
            # face diameter: a second exact reg0 oracle warm-started from
            # our point — two optimal points of the same problem
            x_ref0b = scipy_soft_oracle_from(qp_ref, np.asarray(sol.x))
            _, u_ref0b, _ = unpack_solution(
                spec.nrmp, jnp.asarray(x_ref0b, jnp.float32))
            c = float(np.abs(np.asarray(u_ref0b)[:, 0]
                             - np.asarray(u_ref0)[:, 0]).max())
            d_face.append(c)
            print(f"step {i:3d}: |u0_shipped - u0_ref-form|={a:.2e}   "
                  f"formulation shift={b:.2e}  ref-obj gap={gap0:+.2e} "
                  f"viol={viol0:.1e}  oracle-vs-oracle face diam={c:.2e}",
                  flush=True)

        action, info = planner(state, pts_np)
        if info["arrive"]:
            print(f"arrived at step {i}")
            break
        env.step(action)

    def summ(v):
        a = np.asarray(v)
        return {"p50": float(np.percentile(a, 50)),
                "p90": float(np.percentile(a, 90)), "max": float(a.max())}

    rec = {
        "metric": "optimality_vs_unregularized_reference_formulation",
        "reg_u": float(spec.nrmp.reg_u),
        "reg_d": float(spec.nrmp.reg_d),
        "steps_checked": len(d_ship),
        "shipped_vs_ref_form_u0": summ(d_ship),
        "pure_formulation_shift_u0": summ(d_form),
        "oracle_vs_oracle_face_diameter_u0": summ(d_face),
        "ref_objective_gap_of_shipped": summ(gaps0),
        "ref_hard_violation_of_shipped": summ(viols0),
    }
    print(json.dumps(rec, indent=1))
    # Two gates.  (1) Optimality: the SHIPPED point must be epsilon-optimal
    # for the REFERENCE objective (reg = 0) and feasible.  (2) Action: the
    # face-diameter probe (two exact f64 solvers of the same reg=0 problem,
    # one warm-started from our point) agrees to ~5e-4 max — i.e. the
    # reference problem essentially DETERMINES u0, and any larger
    # |u0_shipped - u0_oracle(0)| is a real, formulation-induced action
    # deviation carried by the regularization (the pure-formulation-shift
    # column is numerically identical to it).  It is therefore assertable,
    # and shrinks with reg_u/reg_d.
    ok_opt = (rec["ref_objective_gap_of_shipped"]["max"] <= 1e-4
              and rec["ref_hard_violation_of_shipped"]["max"] <= 2e-3)
    ok_act = rec["shipped_vs_ref_form_u0"]["p90"] <= 1e-2
    print(("PASS" if ok_opt else "FAIL") +
          "(optimality): shipped actions are epsilon-optimal for the "
          "REFERENCE formulation (reg=0 objective gap <= 1e-4, feasibility "
          "<= 2e-3 on every checked step)")
    print(("PASS" if ok_act else "FAIL") +
          f"(action): |u0_shipped - u0_ref-form| p90 = "
          f"{rec['shipped_vs_ref_form_u0']['p90']:.2e} vs <= 1e-2 "
          f"(target 1e-3) at reg_u={spec.nrmp.reg_u:g}, "
          f"reg_d={spec.nrmp.reg_d:g}")
    out = os.path.join(REPO, "BENCH_FORMULATION_GAP.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
