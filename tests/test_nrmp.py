"""NRMP QP assembly tests.

The oracle solves the *original* NeuPAN inner problem (hinge penalty written
directly, no slacks) with scipy trust-constr; our assembled QP (slack
reformulation, ops/nrmp.py) must produce the same (s, u, d).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import LinearConstraint, minimize

from neupan_tpu.ops.nrmp import AdjustParams, NRMPSpec, build_qp, unpack_solution
from neupan_tpu.ops.qp import ADMMConfig, solve_qp
from neupan_tpu.robot import Robot

CFG = ADMMConfig(iters=300)


def make_problem(T=4, K=3, kinematics="diff", seed=0, with_obs=True):
    rng = np.random.default_rng(seed)
    robot = Robot.create(receding=T, step_time=0.1, kinematics=kinematics,
                         max_speed=[4, 2], max_acce=[4, 2], length=1.6,
                         width=1.0, wheelbase=1.0 if kinematics == "acker" else None)
    spec = NRMPSpec(T=T, K=K if with_obs else 0, kinematics=kinematics,
                    speed_bound=tuple(robot.speed_bound[:, 0]),
                    acce_bound=tuple(robot.acce_bound[:, 0]),
                    ro_obs=100.0, bk=0.1)
    adjust = AdjustParams(
        q_s=jnp.asarray(1.0, jnp.float32), p_u=jnp.asarray(1.0, jnp.float32),
        eta=jnp.asarray(8.0, jnp.float32), d_max=jnp.asarray(1.0, jnp.float32),
        d_min=jnp.asarray(0.1, jnp.float32))

    nom_u = rng.uniform(-0.5, 0.5, (2, T))
    nom_s = np.asarray(robot.rollout(jnp.zeros(3), jnp.asarray(nom_u, jnp.float32)))
    ref_s = nom_s + rng.normal(scale=0.1, size=nom_s.shape)
    ref_us = np.full(T, 1.0)
    A_dyn, B_dyn, C_dyn = robot.linearize(
        jnp.asarray(nom_s, jnp.float32), jnp.asarray(nom_u, jnp.float32))
    if with_obs:
        fa = rng.normal(size=(T, K, 2)) * 0.5
        fb = rng.normal(size=(T, K)) * 0.5 - 1.0
    else:
        fa = fb = None
    return robot, spec, adjust, nom_s, nom_u, ref_s, ref_us, A_dyn, B_dyn, C_dyn, fa, fb


def scipy_nrmp_oracle(spec, adjust, nom_s, nom_u, ref_s, ref_us,
                      A_dyn, B_dyn, C_dyn, fa, fb):
    """Solve the original formulation with the hinge written directly."""
    T, K = spec.T, spec.K
    n = 3 * (T + 1) + 2 * T + (T if not spec.no_obs else 0)
    q_s = float(adjust.q_s)
    p_u = float(adjust.p_u)
    eta = float(adjust.eta)
    m_s = np.array([1, 1, 0.0]) if spec.kinematics == "omni" else np.ones(3)

    def split(x):
        s = x[: 3 * (T + 1)].reshape(T + 1, 3).T
        u = x[3 * (T + 1): 3 * (T + 1) + 2 * T].reshape(T, 2).T
        d = x[3 * (T + 1) + 2 * T:] if not spec.no_obs else None
        return s, u, d

    def f(x):
        s, u, d = split(x)
        c = np.sum(m_s[:, None] * (q_s * s - q_s * ref_s) ** 2)
        c += np.sum((p_u * u[0] - p_u * ref_us) ** 2)
        c += 0.5 * spec.bk * np.sum((s - nom_s) ** 2)
        # round-3 regularization terms (NRMPSpec.reg_u / reg_d)
        c += 0.5 * spec.reg_u * np.sum((u - nom_u) ** 2)
        if not spec.no_obs:
            c += 0.5 * spec.reg_d * np.sum(d**2)
            c += -eta * np.sum(d)
            I = (np.einsum("tkj,jt->tk", fa, s[0:2, 1:]) - fb - d[:, None])
            c += 0.5 * spec.ro_obs * np.sum(np.maximum(-I, 0.0) ** 2)
        return c

    cons = []
    # dynamics + init as equality linear constraints
    Aeq = np.zeros((3 * T + 3, n))
    beq = np.zeros(3 * T + 3)
    for t in range(T):
        for r in range(3):
            row = 3 * t + r
            Aeq[row, 3 * t: 3 * t + 3] = np.asarray(A_dyn)[t, r]
            Aeq[row, 3 * (T + 1) + 2 * t: 3 * (T + 1) + 2 * t + 2] = np.asarray(B_dyn)[t, r]
            Aeq[row, 3 * (t + 1) + r] = -1.0
            beq[row] = -np.asarray(C_dyn)[t, r, 0]
    for r in range(3):
        Aeq[3 * T + r, r] = 1.0
        beq[3 * T + r] = nom_s[r, 0]
    cons.append(LinearConstraint(Aeq, beq, beq))

    # acce + speed + d bounds
    Aacc = np.zeros((2 * (T - 1), n))
    for t in range(T - 1):
        for j in range(2):
            Aacc[2 * t + j, 3 * (T + 1) + 2 * (t + 1) + j] = 1.0
            Aacc[2 * t + j, 3 * (T + 1) + 2 * t + j] = -1.0
    acce = np.tile(np.asarray(spec.acce_bound), T - 1)
    cons.append(LinearConstraint(Aacc, -acce, acce))

    lb = np.full(n, -np.inf)
    ub = np.full(n, np.inf)
    for t in range(T):
        for j in range(2):
            lb[3 * (T + 1) + 2 * t + j] = -spec.speed_bound[j]
            ub[3 * (T + 1) + 2 * t + j] = spec.speed_bound[j]
    if not spec.no_obs:
        lb[3 * (T + 1) + 2 * T:] = max(float(adjust.d_min), 0.0)
        ub[3 * (T + 1) + 2 * T:] = float(adjust.d_max)
    cons.append(LinearConstraint(np.eye(n), lb, ub))

    x0 = np.zeros(n)
    x0[: 3 * (T + 1)] = nom_s.T.reshape(-1)
    res = minimize(f, x0, method="trust-constr", constraints=cons,
                   options={"gtol": 1e-10, "xtol": 1e-12, "maxiter": 5000})
    return split(res.x)


@pytest.mark.parametrize("kinematics", ["diff", "acker"])
def test_nrmp_matches_original_formulation(kinematics):
    (robot, spec, adjust, nom_s, nom_u, ref_s, ref_us,
     A_dyn, B_dyn, C_dyn, fa, fb) = make_problem(kinematics=kinematics)

    qp = build_qp(spec, adjust, jnp.asarray(nom_s, jnp.float32),
                  jnp.asarray(nom_u, jnp.float32),
                  jnp.asarray(ref_s, jnp.float32),
                  jnp.asarray(ref_us, jnp.float32),
                  A_dyn, B_dyn, C_dyn,
                  jnp.asarray(fa, jnp.float32), jnp.asarray(fb, jnp.float32))
    sol = solve_qp(qp, CFG)
    s, u, d = unpack_solution(spec, sol.x)

    s_ref, u_ref, d_ref = scipy_nrmp_oracle(
        spec, adjust, nom_s, nom_u, ref_s, ref_us, A_dyn, B_dyn, C_dyn, fa, fb)

    # The speed channel (the actual control output) must match tightly.
    # Weakly-determined directions (e.g. acker steering when B's steering
    # column is tiny) can differ between optimizers at equal objective, so
    # the full-vector check is via objective value + feasibility.
    np.testing.assert_allclose(np.asarray(u)[0], u_ref[0], atol=2e-3)
    np.testing.assert_allclose(np.asarray(s), s_ref, atol=2e-2)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=2e-3)

    def objective(s_, u_, d_):
        c = float(adjust.q_s) ** 2 * np.sum((s_ - ref_s) ** 2)
        c += float(adjust.p_u) ** 2 * np.sum((u_[0] - ref_us) ** 2)
        c += 0.5 * spec.bk * np.sum((s_ - nom_s) ** 2)
        c += 0.5 * spec.reg_u * np.sum((u_ - nom_u) ** 2)
        c += 0.5 * spec.reg_d * np.sum(d_**2)
        c += -float(adjust.eta) * np.sum(d_)
        I = np.einsum("tkj,jt->tk", np.asarray(fa), s_[0:2, 1:]) - \
            np.asarray(fb) - d_[:, None]
        c += 0.5 * spec.ro_obs * np.sum(np.maximum(-I, 0.0) ** 2)
        return c

    obj_ours = objective(np.asarray(s), np.asarray(u), np.asarray(d))
    obj_ref = objective(s_ref, u_ref, np.asarray(d_ref))
    assert obj_ours <= obj_ref + 1e-3 * (1.0 + abs(obj_ref))


def test_reg_zero_recovers_reference_formulation():
    """With reg_u = reg_d = 0, build_qp assembles exactly the reference's
    NRMP problem (no extra quadratic terms) — the regularization is a pure
    extension, parity-preserving when disabled."""
    (robot, spec, adjust, nom_s, nom_u, ref_s, ref_us,
     A_dyn, B_dyn, C_dyn, fa, fb) = make_problem()
    spec0 = dataclasses.replace(spec, reg_u=0.0, reg_d=0.0)
    qp = build_qp(spec0, adjust, jnp.asarray(nom_s, jnp.float32),
                  jnp.asarray(nom_u, jnp.float32),
                  jnp.asarray(ref_s, jnp.float32),
                  jnp.asarray(ref_us, jnp.float32), A_dyn, B_dyn, C_dyn,
                  jnp.asarray(fa, jnp.float32), jnp.asarray(fb, jnp.float32))
    P = np.asarray(qp.P_diag)
    T = spec.T
    off_u = 3 * (T + 1)
    # omega rows carry no quadratic term, d rows none either
    np.testing.assert_allclose(P[off_u + 1:off_u + 2 * T:2], 0.0)
    np.testing.assert_allclose(P[off_u + 2 * T:], 0.0)
    # and the u-linear term has no nom_u contribution
    qlin = np.asarray(qp.q)
    np.testing.assert_allclose(qlin[off_u + 1:off_u + 2 * T:2], 0.0)


def test_nrmp_no_obs_matches():
    (robot, spec, adjust, nom_s, nom_u, ref_s, ref_us,
     A_dyn, B_dyn, C_dyn, _, _) = make_problem(with_obs=False)

    qp = build_qp(spec, adjust, jnp.asarray(nom_s, jnp.float32),
                  jnp.asarray(nom_u, jnp.float32),
                  jnp.asarray(ref_s, jnp.float32),
                  jnp.asarray(ref_us, jnp.float32), A_dyn, B_dyn, C_dyn)
    sol = solve_qp(qp, CFG)
    s, u, d = unpack_solution(spec, sol.x)
    assert d is None

    s_ref, u_ref, _ = scipy_nrmp_oracle(
        spec, adjust, nom_s, nom_u, ref_s, ref_us, A_dyn, B_dyn, C_dyn, None, None)
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s), s_ref, atol=2e-3)


def test_nrmp_omni_state_cost_mask():
    """omni: theta rows get no state cost; solution's theta tracks dynamics
    only."""
    (robot, spec, adjust, nom_s, nom_u, ref_s, ref_us,
     A_dyn, B_dyn, C_dyn, fa, fb) = make_problem(kinematics="omni", seed=3)
    qp = build_qp(spec, adjust, jnp.asarray(nom_s, jnp.float32),
                  jnp.asarray(nom_u, jnp.float32),
                  jnp.asarray(ref_s, jnp.float32),
                  jnp.asarray(ref_us, jnp.float32), A_dyn, B_dyn, C_dyn,
                  jnp.asarray(fa, jnp.float32), jnp.asarray(fb, jnp.float32))
    sol = solve_qp(qp, ADMMConfig(iters=1500))
    s, u, d = unpack_solution(spec, sol.x)
    s_ref, u_ref, d_ref = scipy_nrmp_oracle(
        spec, adjust, nom_s, nom_u, ref_s, ref_us, A_dyn, B_dyn, C_dyn, fa, fb)
    # theta carries no cost for omni and (v, theta) trade off through the
    # linearized B, so controls (and therefore realized states) are weakly
    # determined near flat directions — the decisive check is that our
    # point is optimal: objective no worse than the oracle's, plus small KKT
    # residuals from the solver itself (dual residual relative to the
    # problem's gradient scale).
    grad_scale = float(jnp.max(jnp.abs(qp.q))) + 1.0
    assert float(sol.r_prim) < 1e-3
    assert float(sol.r_dual) / grad_scale < 1e-3

    m_s = np.array([1.0, 1.0, 0.0])

    def objective(s_, u_, d_):
        c = np.sum(m_s[:, None] * (s_ - ref_s) ** 2)
        c += np.sum((u_[0] - ref_us) ** 2)
        c += 0.5 * spec.bk * np.sum((s_ - nom_s) ** 2)
        c += 0.5 * spec.reg_u * np.sum((u_ - nom_u) ** 2)
        c += 0.5 * spec.reg_d * np.sum(d_**2)
        c += -float(adjust.eta) * np.sum(d_)
        I = np.einsum("tkj,jt->tk", np.asarray(fa), s_[0:2, 1:]) - \
            np.asarray(fb) - d_[:, None]
        c += 0.5 * spec.ro_obs * np.sum(np.maximum(-I, 0.0) ** 2)
        return c

    obj_ours = objective(np.asarray(s), np.asarray(u), np.asarray(d))
    obj_ref = objective(s_ref, u_ref, np.asarray(d_ref))
    assert obj_ours <= obj_ref + 1e-3 * (1.0 + abs(obj_ref))


def test_vector_qs_weighting():
    """3-vector q_s changes the assembled P/q on the right rows."""
    (robot, spec, adjust, nom_s, nom_u, ref_s, ref_us,
     A_dyn, B_dyn, C_dyn, fa, fb) = make_problem()
    adj_vec = adjust._replace(q_s=jnp.asarray([2.0, 1.0, 0.5], jnp.float32))
    qp = build_qp(spec, adj_vec, jnp.asarray(nom_s, jnp.float32),
                  jnp.asarray(nom_u, jnp.float32),
                  jnp.asarray(ref_s, jnp.float32),
                  jnp.asarray(ref_us, jnp.float32), A_dyn, B_dyn, C_dyn,
                  jnp.asarray(fa, jnp.float32), jnp.asarray(fb, jnp.float32))
    P = np.asarray(qp.P_diag)
    # x-row weight 2*(2^2)+bk, y-row 2*1+bk, theta-row 2*0.25+bk
    np.testing.assert_allclose(P[0], 2 * 4 + spec.bk, rtol=1e-6)
    np.testing.assert_allclose(P[1], 2 * 1 + spec.bk, rtol=1e-6)
    np.testing.assert_allclose(P[2], 2 * 0.25 + spec.bk, rtol=1e-6)


