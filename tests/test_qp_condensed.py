"""Direct unit tests of the round-4 production solver path.

VERDICT round-4 #6 / advisor round-4 medium: the shipped default
(condense_admm=True + elim_n_acc box-eliminating polish, wired by
pan._admm_with_elim) previously had no oracle test of its own — the scipy
oracle tests used the full-space path and the banded test switched
condense_admm off.  These tests pin, on real NRMP instances at the
flagship shapes (T=10, K=10):

  * condensed ADMM == full-space ADMM == scipy f64 oracle (u0 agreement);
  * the box-eliminating polish (elim_n_acc) == the generic dual-Schur
    polish (elim_n_acc=None);
  * _gj_inverse_scaled vs a float64 inverse on real rho_eq-stiffened
    normal matrices (the unrolled Gauss-Jordan is the only inverse the
    shipped forward pass uses, ops/qp.py:_GJ_MAX_N);
  * the banded Hotelling-refinement guard never returns a worse inverse
    than the raw factorization (advisor round-4 low).

A regression in the condensation/box-elimination now fails a unit test
instead of surfacing as closed-loop scenario weirdness.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neupan_tpu.ops import banded
from neupan_tpu.ops import qp as qp_mod
from neupan_tpu.ops.nrmp import (AdjustParams, NRMPSpec, build_qp,
                                 condensation, unpack_solution)
from neupan_tpu.ops.qp import ADMMConfig, solve_qp
from neupan_tpu.robot import Robot

from tests.test_nrmp import scipy_nrmp_oracle


def make_flagship_instance(seed=0, contact=True):
    """One REALISTIC NRMP QP at the flagship shapes (T=10, K=10, diff).

    The obstacle coefficients come from the real DUNE pipeline (exact
    closed-form duals of the polygon distance problem on a corridor-like
    wall of points), not random matrices: random fa/fb with ro_obs=400
    create penalty gradients far outside the qualified envelope (no
    planner state produces them — lam rows have norm <= 1 and hinge
    arguments are distance-scaled).  ``contact`` moves the wall close
    enough that many hinge rows are active (the regime that exercised the
    round-3 polish bugs); contact=False keeps the wall clear.
    """
    from neupan_tpu.ops.dune import generate_point_flow
    from neupan_tpu.ops.nrmp import coefficients_from_dune
    from neupan_tpu.training.labels import polygon_distance_labels

    T, K = 10, 10
    rng = np.random.default_rng(seed)
    robot = Robot.create(receding=T, step_time=0.1, kinematics="diff",
                         max_speed=[8, 1], max_acce=[8, 3], length=1.6,
                         width=2.0)
    spec = NRMPSpec(T=T, K=K, kinematics="diff",
                    speed_bound=tuple(robot.speed_bound[:, 0]),
                    acce_bound=tuple(robot.acce_bound[:, 0]))
    adjust = AdjustParams(
        q_s=jnp.asarray(1.0, jnp.float32), p_u=jnp.asarray(1.0, jnp.float32),
        eta=jnp.asarray(10.0, jnp.float32), d_max=jnp.asarray(1.0, jnp.float32),
        d_min=jnp.asarray(0.1, jnp.float32))

    nom_u = np.zeros((2, T))
    nom_u[0] = rng.uniform(1.0, 3.0)               # forward speed
    nom_u[1] = rng.uniform(-0.2, 0.2)              # slight turn
    nom_s = np.asarray(robot.rollout(jnp.zeros(3),
                                     jnp.asarray(nom_u, jnp.float32)))
    ref_s = nom_s + rng.normal(scale=0.05, size=nom_s.shape)
    ref_us = np.full(T, 4.0)
    A_dyn, B_dyn, C_dyn = robot.linearize(
        jnp.asarray(nom_s, jnp.float32), jnp.asarray(nom_u, jnp.float32))

    # corridor walls flanking the nominal path (+ a grazing pillar when
    # contact): real geometry -> exact DUNE duals -> real fa/fb.  The
    # pillar grazes rather than blocks — a nominal trajectory that drives
    # THROUGH an obstacle is outside the planner's envelope (the planner
    # never produces one) and no fixed-budget first-order solver converges
    # on the resulting deep-collision hinge stack from a cold start.
    gap = 1.5 if contact else 3.0
    xs = np.linspace(-1.0, 6.0, 40)
    wall = np.concatenate([
        np.stack([xs, np.full_like(xs, gap)]),
        np.stack([xs, np.full_like(xs, -gap)]),
    ], axis=1)
    if contact:
        ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
        pillar = np.stack([3.0 + 0.3 * np.cos(ang),
                           1.15 + 0.3 * np.sin(ang)])
        wall = np.concatenate([wall, pillar], axis=1)
    pts = jnp.asarray(wall + rng.normal(scale=0.02, size=wall.shape),
                      jnp.float32)
    P = pts.shape[1]
    mask = jnp.ones((P,), bool)
    vels = jnp.zeros((2, P), jnp.float32)

    with jax.default_matmul_precision("highest"):
        pf, R_all, glob = generate_point_flow(
            jnp.asarray(nom_s, jnp.float32), pts, vels, robot.dt)
        # exact duals per frame (the quantity the trained encoder
        # approximates; reference dune_train.py:85-99), then the DUNE
        # top-k selection by ascending distance
        G = jnp.asarray(robot.G, jnp.float32)
        h = jnp.asarray(robot.h, jnp.float32)
        mu_all, d_all = jax.vmap(
            lambda fp: polygon_distance_labels(robot.G, robot.h, fp.T))(pf)
        # mu_all: (T+1, P, E), d_all: (T+1, P)
        _, idx = jax.lax.top_k(-d_all, K)                  # (T+1, K)
        take = jax.vmap(lambda arr, i: arr[:, i])
        mu_k = take(jnp.swapaxes(mu_all, 1, 2), idx)       # (T+1, E, K)
        RG = jnp.einsum("tab,eb->tae", R_all, G)
        lam_k = -jnp.einsum("tae,tek->tak", RG, mu_k)      # (T+1, 2, K)
        points_k = take(glob, idx)                         # (T+1, 2, K)
        valid_k = jnp.ones((nom_s.shape[1], K), bool)
        fa, fb = coefficients_from_dune(spec, mu_k, lam_k, points_k,
                                        valid_k, h, jnp.any(mask))

    qp = build_qp(spec, adjust, jnp.asarray(nom_s, jnp.float32),
                  jnp.asarray(nom_u, jnp.float32),
                  jnp.asarray(ref_s, jnp.float32),
                  jnp.asarray(ref_us, jnp.float32), A_dyn, B_dyn, C_dyn,
                  fa, fb)
    elim = condensation(spec, A_dyn, B_dyn, C_dyn,
                        jnp.asarray(nom_s[:, 0], jnp.float32))
    oracle_args = (spec, adjust, nom_s, nom_u, ref_s, ref_us,
                   A_dyn, B_dyn, C_dyn, np.asarray(fa), np.asarray(fb))
    return spec, qp, elim, oracle_args


def layout_cfg(spec, **over):
    """ADMMConfig with the NRMP row-layout statics (pan._admm_with_elim)."""
    n_eq = spec.r_acc
    n_hard = spec.r_obs - spec.r_acc
    n_acc = spec.r_spd - spec.r_acc
    return ADMMConfig(elim_n_eq=n_eq, elim_n_hard=n_hard, elim_n_acc=n_acc,
                      **over)


SEEDS = [0, 1, 2, 3, 4]


def warm_start(qp, spec, elim, noise=1e-3, seed=0):
    """A realistic warm start: an accurate solve of the SAME scene,
    perturbed — the planner's shipped regime is warm-started (cross-tick
    x_warm/y_warm, ops/pan.py:PANState), and that is what the 120-iteration
    default budget is qualified against.  From a COLD start a deep-contact
    instance needs ~10x the budget (measured while writing this test)."""
    cfg_acc = layout_cfg(spec, condense_admm=True, iters=1200,
                         rho_updates=5, polish_rounds=6)
    with jax.default_matmul_precision("highest"):
        sol = solve_qp(qp, cfg_acc, elim=elim)
    rng = np.random.default_rng(100 + seed)
    x0 = jnp.asarray(np.asarray(sol.x) +
                     rng.normal(scale=noise, size=sol.x.shape), jnp.float32)
    y0 = jnp.asarray(np.asarray(sol.y) *
                     (1.0 + rng.normal(scale=noise, size=sol.y.shape)),
                     jnp.float32)
    return x0, y0


@pytest.mark.parametrize("seed", SEEDS)
def test_condensed_admm_matches_fullspace_and_oracle(seed):
    """Shipped path (condensed ADMM + box-elim polish) vs the full-space
    ADMM on the SAME QP at the SHIPPED budget (warm-started, as deployed),
    both against the scipy f64 oracle."""
    contact = seed % 2 == 0
    spec, qp, elim, oracle_args = make_flagship_instance(seed, contact)
    x0, y0 = warm_start(qp, spec, elim, seed=seed)
    cfg_c = layout_cfg(spec, condense_admm=True)
    cfg_f = layout_cfg(spec, condense_admm=False)
    with jax.default_matmul_precision("highest"):
        sol_c = solve_qp(qp, cfg_c, x0, y0, elim=elim)
        sol_f = solve_qp(qp, cfg_f, x0, y0, elim=elim)
    _, u_c, _ = unpack_solution(spec, sol_c.x)
    _, u_f, _ = unpack_solution(spec, sol_f.x)
    # the two ADMM spaces must land on the same polished optimum: the
    # COMMANDED action u0 (column 0, what the robot executes) to the f32
    # polish accuracy floor (_polish tols floor 3e-4; measured u0
    # disagreement across these seeds <= 2.7e-4 — a real condensation bug
    # shows up at >= 1e-2), the full horizon to 1e-3 (tail columns are
    # the least determined)
    np.testing.assert_allclose(np.asarray(u_c)[:, 0], np.asarray(u_f)[:, 0],
                               rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(u_c), np.asarray(u_f), atol=1e-3)
    # and both on the f64 oracle
    _, u_ref, _ = scipy_nrmp_oracle(*oracle_args)
    np.testing.assert_allclose(np.asarray(u_c)[:, 0], u_ref[:, 0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(u_f)[:, 0], u_ref[:, 0], atol=1e-3)
    assert float(sol_c.r_prim) < 2e-3
    assert float(sol_f.r_prim) < 2e-3


@pytest.mark.parametrize("seed", SEEDS[:3])
def test_box_elim_polish_matches_generic_schur(seed):
    """elim_n_acc (box-eliminating polish) == generic dual-Schur polish."""
    spec, qp, elim, _ = make_flagship_instance(seed, contact=True)
    x0, y0 = warm_start(qp, spec, elim, seed=seed)
    cfg_box = layout_cfg(spec, condense_admm=True)
    cfg_gen = dataclasses.replace(cfg_box, elim_n_acc=None)
    with jax.default_matmul_precision("highest"):
        sol_b = solve_qp(qp, cfg_box, x0, y0, elim=elim)
        sol_g = solve_qp(qp, cfg_gen, x0, y0, elim=elim)
    _, u_b, _ = unpack_solution(spec, sol_b.x)
    _, u_g, _ = unpack_solution(spec, sol_g.x)
    np.testing.assert_allclose(np.asarray(u_b)[:, 0], np.asarray(u_g)[:, 0],
                               rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_g), atol=1e-3)
    assert float(sol_b.r_prim) < 2e-3


def _condensed_normal_matrix(spec, qp, elim, cfg):
    """The (k, k) matrix the condensed ADMM actually inverts (after Ruiz)."""
    Z, xp = elim
    n_eq = cfg.elim_n_eq
    A = qp.A
    Ar = A[n_eq:] @ Z
    Axp = A[n_eq:] @ xp
    l_r = qp.l[n_eq:] - Axp
    u_r = qp.u[n_eq:] - Axp
    soft_r = None if qp.soft is None else qp.soft[n_eq:]
    PZ = Z * qp.P_diag[:, None]
    Hr = Z.T @ PZ
    qr = Z.T @ (qp.q + qp.P_diag * xp)
    Hs, qs, As, ls, us, soft_s, D, E, c = qp_mod._ruiz_equilibrate_dense(
        Hr, qr, Ar, l_r, u_r, soft_r, cfg.ruiz_iters)
    is_eq = (jnp.minimum(us, qp_mod._BIG) - jnp.maximum(ls, -qp_mod._BIG)) < 1e-9
    rho = jnp.where(is_eq, cfg.rho * cfg.rho_eq_scale, cfg.rho)
    k = Hs.shape[0]
    return Hs + cfg.sigma * jnp.eye(k, dtype=Hs.dtype) + (As.T * rho) @ As


@pytest.mark.parametrize("seed", SEEDS[:3])
def test_gj_inverse_vs_f64_on_real_normal_matrices(seed):
    """_gj_inverse_scaled (via _spd_inverse, n=30 <= _GJ_MAX_N) against a
    float64 inverse of the SAME real condensed NRMP normal matrix."""
    spec, qp, elim, _ = make_flagship_instance(seed, contact=True)
    cfg = layout_cfg(spec)
    with jax.default_matmul_precision("highest"):
        M = _condensed_normal_matrix(spec, qp, elim, cfg)
        assert M.shape[0] <= qp_mod._GJ_MAX_N  # the GJ path really runs
        X = qp_mod._spd_inverse(M, cfg)
        n = M.shape[0]
        resid = float(jnp.max(jnp.abs(M @ X - jnp.eye(n))))
    # round-4 measured ||MX-I||_inf ~ 9e-5 on these matrices; 5e-4 bounds
    # a regression without flaking on seed variation
    assert resid < 5e-4, resid
    X64 = np.linalg.inv(np.asarray(M, np.float64))
    rel = np.abs(np.asarray(X) - X64).max() / np.abs(X64).max()
    # limited by the f32 data + the 1e-7 scaled ridge, not the algorithm
    assert rel < 1e-3, rel


def test_gj_inverse_scaled_matches_f64_directly():
    """_gj_inverse_scaled on a scaled+ridged SPD matrix == f64 inverse of
    exactly that matrix (isolates the kernel from the Jacobi wrapper)."""
    rng = np.random.default_rng(0)
    for n in (8, 30, 36):
        Q = rng.normal(size=(n, n))
        M = Q @ Q.T / n + np.eye(n)
        dj = 1.0 / np.sqrt(np.abs(np.diag(M)))
        Mt = M * dj[:, None] * dj[None, :] + 1e-7 * np.eye(n)
        X = np.asarray(qp_mod._gj_inverse_scaled(
            jnp.asarray(Mt, jnp.float32)))
        X64 = np.linalg.inv(Mt)
        rel = np.abs(X - X64).max() / np.abs(X64).max()
        assert rel < 2e-5, (n, rel)


def test_banded_hotelling_guard_never_worse():
    """The guarded Hotelling refinement (advisor round-4) must never
    return a worse inverse than the raw factorization — including on a
    matrix where the sweeps genuinely DIVERGE.

    Construction: a 3-block chain (kron with I_b) whose dropped far
    coupling f adds energy along the truncated matrix's softest direction
    — M3 = [[1,a,f],[a,1,a],[f,a,1]] with a=0.65, f=0.35 is SPD, the
    block-tridiagonal truncation factors cleanly, and the residual
    operator I - M X0 has spectral radius > 1 (measured: unguarded sweeps
    take the inf-norm residual 1.47 -> 3.3 -> 17)."""
    a, f, b = 0.65, 0.35, 6
    M3 = np.array([[1, a, f], [a, 1, a], [f, a, 1]])
    assert np.linalg.eigvalsh(M3).min() > 0  # SPD precondition
    M = np.kron(M3, np.eye(b))
    n = 3 * b
    Mj = jnp.asarray(M, jnp.float32)
    perm = jnp.arange(n, dtype=jnp.int32)
    eye = np.eye(n)
    with jax.default_matmul_precision("highest"):
        X0 = np.asarray(banded.btd_spd_inverse(Mj, perm, b, refine=0))
        X2 = np.asarray(banded.btd_spd_inverse(Mj, perm, b, refine=2))
    r0 = np.abs(M @ X0 - eye).max()
    r2 = np.abs(M @ X2 - eye).max()
    # precondition: an UNGUARDED sweep really diverges on this matrix
    Xs = X0 + X0 @ (eye - M @ X0)
    rs = np.abs(M @ Xs - eye).max()
    assert rs > r0, (r0, rs)
    # the guard must have dropped the sweeps (never worse than raw)
    assert np.isfinite(r2)
    assert r2 <= 1.05 * r0, (r0, r2)


def test_banded_hotelling_guard_still_refines():
    """On a genuinely block-tridiagonal stiff matrix the guard must KEEP
    the sweeps (refinement still reaches dense accuracy at T=30)."""
    from tests.test_banded import make_M
    T = 30
    M = make_M(T, seed=T)
    perm = jnp.asarray(banded.nrmp_permutation(T))
    with jax.default_matmul_precision("highest"):
        X0 = banded.btd_spd_inverse(M, perm, 6, refine=0)
        X2 = banded.btd_spd_inverse(M, perm, 6, refine=2)
        n = M.shape[0]
        r0 = float(jnp.max(jnp.abs(M @ X0 - jnp.eye(n))))
        r2 = float(jnp.max(jnp.abs(M @ X2 - jnp.eye(n))))
    scale = float(jnp.max(jnp.abs(M)))
    assert r2 / scale < 1e-4
    assert r2 < r0
