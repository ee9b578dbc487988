"""Batched differentiable QP solver (OSQP-style ADMM) in pure JAX.

This replaces the reference's cvxpy + cvxpylayers + ECOS stack
(reference: blocks/nrmp.py:279-304, the only native hot path of the
reference).  TPU-first design decisions:

* Problems are solved in standard form
      minimize    1/2 x' diag(P_diag) x + q' x
      subject to  l <= A x <= u
  with a *diagonal* quadratic term — the NRMP objective is diagonal after
  introducing hinge slacks (see ops/nrmp.py), so the ADMM normal matrix
  M = diag(P + sigma) + A' R A is formed with one batched matmul.
* The ADMM loop is a fixed-iteration ``lax.scan``; per-iteration work is
  three batched matrix-vector products (M^{-1} is materialized once per
  solve), so thousands of scenarios stream through the MXU/VPU with no
  host round-trips and no data-dependent control flow.
* A polish step (masked active-set KKT solve + iterative refinement, the
  OSQP polishing strategy) recovers near-interior-point accuracy.
* One-sided quadratic *penalty* rows (``QPData.soft``) are handled directly
  by the z-update prox instead of via slack variables — the NRMP hinge
  penalty needs no extra T*K variables/rows, keeping the dense factorized
  matrices (the dominant cost) small.
* ``solve_qp`` is wrapped in ``jax.custom_vjp``: gradients w.r.t. P, q, A,
  l, u are obtained by implicit differentiation of the active-set KKT
  system (OptNet-style), preserving the reference's differentiable-layer
  capability used by LON tuning (reference: example/LON/LON_corridor.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = 1e20  # stand-in for +inf bounds inside kernels


class QPData(NamedTuple):
    """One QP in OSQP standard form (possibly with leading batch dims).

    ``soft`` (optional) marks one-sided *penalty* rows: row i with
    soft_i > 0 contributes 0.5 * soft_i * min(A_i x - l_i, 0)^2 to the
    objective instead of enforcing l_i <= A_i x (u_i must be +inf for such
    rows).  This expresses hinge penalties without slack variables — the
    NRMP obstacle term drops T*K slacks and T*K extra rows this way,
    shrinking the dense factorizations the solver rides on.  soft_i == 0
    (or soft=None) means an ordinary hard row.
    """

    P_diag: jnp.ndarray  # (n,)
    q: jnp.ndarray       # (n,)
    A: jnp.ndarray       # (m, n)
    l: jnp.ndarray       # (m,)
    u: jnp.ndarray       # (m,)
    soft: Optional[jnp.ndarray] = None  # (m,) one-sided penalty weights


class QPSolution(NamedTuple):
    x: jnp.ndarray       # (n,) primal
    y: jnp.ndarray       # (m,) dual
    z: jnp.ndarray       # (m,) constraint value Ax (projected)
    r_prim: jnp.ndarray  # scalar, final primal residual (inf norm)
    r_dual: jnp.ndarray  # scalar, final dual residual (inf norm)


@dataclasses.dataclass(frozen=True)
class ADMMConfig:
    # Contract-qualified default.  Per-QP optimality alone would admit 150
    # (scripts/exp_control_accuracy.py PASSes at 150/200/300; 100 fails on
    # hard feasibility 3.7e-2) — but closed-loop scenario OUTCOMES are
    # chaotic in the solver config: at 200/250 iters the corridor/diff
    # robot dodges the x=10 pillar downward into a cul-de-sac and
    # deadlocks (the stuck-state QP matches the f64 oracle to 2e-4 —
    # a formulation-level MPC fixed point, not a solver failure; see
    # scripts/exp_stuck_oracle.py), while at 300+ it dodges upward and
    # arrives.  300 = the cheapest count where the contract passes AND the
    # 25-scenario sweep arrives 25/25; 400 buys nothing more and costs
    # ~1.3x end-to-end.
    iters: int = 300
    # step-size on the Ruiz-equilibrated problem; rho ~ 1 is the natural
    # scale after equilibration (0.1 converges far too slowly on stiff
    # obstacle-heavy NRMP instances)
    rho: float = 1.0
    # number of residual-balancing rho updates (re-factorizations) spread
    # evenly across the iterations; one mid-run update is robust — more
    # frequent updates measured counterproductive on stiff instances
    rho_updates: int = 1
    rho_eq_scale: float = 1e3
    sigma: float = 1e-6
    alpha: float = 1.6
    polish: bool = True
    polish_delta: float = 1e-7
    # polish iterative-refinement steps (cheap matvec rounds): 5 floors the
    # hard-constraint violation at the f32 level (~2e-4 absolute on NRMP
    # scales); 3 left ~1e-3 beta-penalty error on hinge-active instances.
    refine_steps: int = 5
    # recover polish duals by least squares against stationarity (the
    # beta-difference-quotient duals carry O(beta*eps) ~ 1e-2 noise).
    # Off by default: it buys ~3x better dual/stationarity fidelity
    # (stat64 p50 2.5e-4 vs 1.3e-3 on hinge-active corridor instances) at
    # the cost of one extra (m, m) factorization per polish candidate;
    # the planner-relevant outputs (primal, objective gap ~1e-7, hard
    # feasibility ~OSQP's 1e-3 eps) are equivalent.  Turn on (ideally with
    # inverse_method="lu") when precise duals matter, e.g. offline
    # analysis; LON's gradient tests pass either way.
    dual_recovery: bool = False
    eps_act: float = 1e-5  # dual magnitude that marks a constraint active
    # SPD inverse path for the ADMM normal matrix and the polish Hessian:
    # "chol" (default): Jacobi scaling + small ridge + batched Cholesky —
    #   pivot-free, constant TPU timing, accurate to the ridge level (the
    #   polish refinement removes the ridge error geometrically).
    # "lu": pivoted LU via jnp.linalg.inv — most accurate, but measured
    #   ~100x slower on TPU for real high-condition polish Hessians than
    #   for random same-shape inputs (data-dependent slow path).
    # "ns": MXU-matmul Newton-Schulz, the original path; f32 NS provably
    #   cannot converge once lambda_min/lambda_ub < f32 eps, which real
    #   polish Hessians hit at cond ~1e7.  History: NS was chosen when the
    #   problems were 163x163 with slack variables and XLA's batched
    #   factorizations measured ~30 ms; at 63x63 factorizations win.
    inverse_method: str = "chol"
    # Newton-Schulz iterations for inverse_method="ns".  Notes from the NS
    # era (still relevant when using "ns"): the flagship bench batch floors
    # by 16 iterations, but stiff corridor instances need 40, and the NRMP
    # optimum is *degenerate* — actions move >1e-3 under ANY solver
    # perturbation (including raising ns to 64), so goldens pin the exact
    # configuration.  Mixed-precision NS (bf16 front + f32 tail) diverges.
    ns_iters: int = 40
    # polish equality-penalty weight (primal active-set solve): larger ->
    # more accurate single solve but worse conditioning; the iterative
    # refinement loop removes the O(1/beta) penalty error geometrically.
    polish_beta: float = 1e2
    # total polish rounds: round 1 tries two candidates guessed from the
    # ADMM iterate; each further round re-guesses the active set from the
    # best point tried (classic add-by-violation / drop-by-dual-sign) and
    # re-polishes.  Default 2: at iters=300 the round-1 guesses from the
    # ADMM duals leave a 5.8e-3 hard violation on one corridor contract
    # step (an active-set miss — refinement cannot fix a row it does not
    # enforce); the add-by-violation round floors it at 2.0e-4, back at
    # the contract's measured-clean level, for ~5% end-to-end cost.
    polish_rounds: int = 2
    # Use the caller-provided structured matvec (factored constraint
    # blocks) inside the ADMM scan body instead of the dense (m, n) A.
    # The factored form carries ~20x fewer bytes than the dense A, but on
    # the real chip (TPU v5 lite, B=512 flagship bench) it measured a 1.8x
    # END-TO-END REGRESSION (2465 vs 4409 solves/s): the small gathers/
    # segment products lower to many VPU ops while the dense form is one
    # MXU batched matmul that never leaves VMEM at these sizes (m=114,
    # n=63).  Default OFF; callers must also pass `struct=` to solve_qp
    # for it to take effect.  Kept as an option for long-horizon problems
    # where the dense A stops fitting VMEM.
    structured_iters: bool = False
    # per-row rho scaling exponent for soft (penalty) rows:
    # rho_i = base_rho^(1-p) * soft_i^p.  The z-prox damps the dual update
    # of a soft row by rho/(rho+soft), which looks like it should stall —
    # but measured on REAL trained corridor instances (scripts/
    # exp_control_accuracy.py, /tmp/bad_qp_step60 diagnosis) p=0 converges
    # to kkt ~3e-4 by 400 iterations while p=0.5 stalls at kkt ~0.9.  The
    # opposite held on the synthetic random-coefficient bench batch (p=0.5
    # cut worst-case kkt 3.2 -> 0.4), whose instances are degenerate
    # (untrained encoder -> near-identical penalty rows).  Real instances
    # win: default 0.  Knob kept for experimentation.
    soft_rho_power: float = 0.0


def _spd_inverse(M: jnp.ndarray, cfg: "ADMMConfig") -> jnp.ndarray:
    """Inverse of an SPD matrix, Jacobi-scaled for conditioning.

    See ADMMConfig.inverse_method for the trade-offs ("chol" default).
    """
    if cfg.inverse_method == "ns":
        return _ns_spd_inverse(M, cfg.ns_iters)
    n = M.shape[-1]
    dj = jax.lax.rsqrt(jnp.abs(jnp.diagonal(M, axis1=-2, axis2=-1)) + 1e-30)
    Mt = M * dj[..., :, None] * dj[..., None, :]
    eye = jnp.eye(n, dtype=M.dtype)
    if cfg.inverse_method == "lu":
        X = jnp.linalg.inv(Mt)
    else:  # "chol" (default): SPD-native, pivot-free — constant TPU timing.
        # jnp.linalg.inv's pivoted LU measured ~100x slower on TPU for the
        # REAL high-condition polish Hessians than for random matrices of
        # the same shape (data-dependent slow path); Cholesky has no such
        # cliff.  The ridge (1e-6 on the unit Jacobi diagonal) caps the
        # factorization condition at ~1e6 so f32 Cholesky cannot break
        # down; the resulting O(ridge*cond) inverse error is yet another
        # regularizer that the polish refinement removes geometrically.
        Mt = Mt + 1e-7 * eye
        ch = jnp.linalg.cholesky(Mt)
        X = jax.scipy.linalg.cho_solve(
            (ch, True), jnp.broadcast_to(eye, Mt.shape))
    return X * dj[..., :, None] * dj[..., None, :]


def _ns_spd_inverse(M: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Inverse of an SPD matrix by Jacobi-scaled Newton-Schulz iteration.

    TPU-first replacement for cho_factor + cho_solve(eye): the iteration
    X <- X (2I - M X) is two (n, n) matmuls per step, which batch and tile
    onto the MXU, instead of XLA's sequential blocked Cholesky.  Safe init
    for SPD: after symmetric Jacobi scaling (unit diagonal), lambda_max is
    bounded by the max absolute row sum, so X0 = I / rowsum_max gives
    ||I - M X0||_2 < 1 and monotone quadratic convergence.
    """
    n = M.shape[-1]
    dj = jax.lax.rsqrt(jnp.abs(jnp.diagonal(M, axis1=-2, axis2=-1)) + 1e-30)
    Mt = M * dj[..., :, None] * dj[..., None, :]
    linf = jnp.max(jnp.sum(jnp.abs(Mt), axis=-1), axis=-1)
    eye = jnp.eye(n, dtype=M.dtype)
    X = eye / linf[..., None, None]
    eye2 = 2.0 * eye

    def body(X, _):
        return X @ (eye2 - Mt @ X), None

    X, _ = jax.lax.scan(body, X, None, length=iters)
    return X * dj[..., :, None] * dj[..., None, :]


def _clip_bounds(l: jnp.ndarray, u: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.maximum(l, -_BIG), jnp.minimum(u, _BIG)


def _rho_vec(l: jnp.ndarray, u: jnp.ndarray, cfg: ADMMConfig) -> jnp.ndarray:
    is_eq = (u - l) < 1e-9
    return jnp.where(is_eq, cfg.rho * cfg.rho_eq_scale, cfg.rho)


def _ruiz_equilibrate(qp: QPData, iters: int = 10):
    """Ruiz equilibration of the KKT matrix (the OSQP scaling strategy).

    Returns (scaled QPData, D (n,), E (m,), c) such that
        P̄ = c D P D,  q̄ = c D q,  Ā = E A D,  l̄ = E l,  ū = E u
    and the unscaled solution is x = D x̄, y = c^{-1} E ȳ.
    """
    P, q, A = qp.P_diag, qp.q, qp.A
    l, u = qp.l, qp.u
    n, m = P.shape[0], A.shape[0]
    D = jnp.ones((n,), P.dtype)
    E = jnp.ones((m,), P.dtype)
    c = jnp.asarray(1.0, P.dtype)

    def body(carry, _):
        P, q, A, D, E, c = carry
        col_norm = jnp.sqrt(jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(A), axis=0), jnp.abs(P)), 1e-8))
        row_norm = jnp.sqrt(jnp.maximum(jnp.max(jnp.abs(A), axis=1), 1e-8))
        d = 1.0 / col_norm
        e = 1.0 / row_norm
        P = P * d * d
        q = q * d
        A = A * e[:, None] * d[None, :]
        # cost scaling keeps the quadratic part O(1)
        gamma = 1.0 / jnp.maximum(
            jnp.maximum(jnp.mean(jnp.abs(P)), jnp.max(jnp.abs(q))), 1e-8)
        gamma = jnp.clip(gamma, 1e-6, 1e6)
        P = P * gamma
        q = q * gamma
        return (P, q, A, D * d, E * e, c * gamma), None

    (P, q, A, D, E, c), _ = jax.lax.scan(
        body, (P, q, A, D, E, c), None, length=iters)
    # a penalty 0.5*soft*neg(z - l)^2 written in scaled row coordinates
    # z_bar = E z picks up c (objective scaling) / E^2 (row scaling):
    soft = None if qp.soft is None else c * qp.soft / (E * E)
    return QPData(P, q, A, E * l, E * u, soft), D, E, c


def _admm_core(qp: QPData, cfg: ADMMConfig, x0: jnp.ndarray, y0: jnp.ndarray,
               struct=None):
    """Run fixed-iteration ADMM for one (unbatched) QP. vmap for batches.

    The problem is Ruiz-equilibrated first (fixed rho works reliably on the
    scaled problem, as in OSQP), then two scan phases run with one
    residual-balancing rho update and re-factorization in between.

    ``struct`` (optional) = ((matvec, rmatvec), blocks): a factored form of
    the UNSCALED constraint matrix.  When given (and cfg.structured_iters),
    the scan body computes A-products through it — the equilibration scales
    D/E wrap around the unscaled operator — while the dense A is still used
    for the one-time normal-matrix formation and final residuals.
    """
    qp_s, D, E, c = _ruiz_equilibrate(qp)
    P, q, A = qp_s.P_diag, qp_s.q, qp_s.A
    l, u = _clip_bounds(qp_s.l, qp_s.u)
    n = P.shape[0]
    is_eq = (u - l) < 1e-9
    soft = qp_s.soft
    is_soft = None if soft is None else soft > 0.0

    if struct is not None and cfg.structured_iters:
        (s_mv, s_rmv), blocks = struct

        def Amv(x):
            return E * s_mv(blocks, D * x)

        def Armv(y):
            return D * s_rmv(blocks, E * y)
    else:
        def Amv(x):
            return A @ x

        def Armv(y):
            return A.T @ y

    # warm start in scaled coordinates: x_bar = D^{-1} x, y_bar = c E^{-1} y
    x0 = x0 / D
    y0 = c * y0 / E

    def z_prox(v, rho):
        """prox of the row-separable g(z): box indicator for hard rows,
        one-sided quadratic 0.5*soft*neg(z - l)^2 for soft rows."""
        z_hard = jnp.clip(v, l, u)
        if soft is None:
            return z_hard
        z_sf = jnp.where(v >= l, v, l + (v - l) * rho / (rho + soft))
        return jnp.where(is_soft, jnp.minimum(z_sf, u), z_hard)

    def phase(x, z, y, rho, iters):
        # Normal-matrix inverse is materialized so the scan body is pure
        # matmuls (fast on TPU; no triangular solves in the loop).
        M = jnp.diag(P + cfg.sigma) + (A.T * rho) @ A
        Minv = _spd_inverse(M, cfg)

        def body(carry, _):
            x, z, y = carry
            rhs = cfg.sigma * x - q + Armv(rho * z - y)
            x_t = Minv @ rhs
            z_t = Amv(x_t)
            x_new = cfg.alpha * x_t + (1.0 - cfg.alpha) * x
            z_mix = cfg.alpha * z_t + (1.0 - cfg.alpha) * z
            z_new = z_prox(z_mix + y / rho, rho)
            y_new = y + rho * (z_mix - z_new)
            return (x_new, z_new, y_new), None

        (x, z, y), _ = jax.lax.scan(body, (x, z, y), None, length=iters)
        return x, z, y

    def rebalance(base_rho, x, z, y):
        """OSQP residual-balancing update of the scalar rho."""
        Ax = Amv(x)
        Px, Aty = P * x, Armv(y)
        rp = jnp.max(jnp.abs(Ax - z)) / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z))), 1e-6)
        rd = jnp.max(jnp.abs(Px + q + Aty)) / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px)),
                        jnp.maximum(jnp.max(jnp.abs(Aty)),
                                    jnp.max(jnp.abs(q)))), 1e-6)
        scale = jnp.clip(jnp.sqrt(rp / jnp.maximum(rd, 1e-12)), 1e-2, 1e2)
        return jnp.clip(base_rho * scale, 1e-4, 1e3)

    n_phases = max(1, int(cfg.rho_updates) + 1)
    per_phase = max(cfg.iters // n_phases, 1)

    base_rho = jnp.asarray(cfg.rho, P.dtype)
    z0 = jnp.clip(Amv(x0), l, u)
    x, z, y = x0, z0, y0
    for k in range(n_phases):
        rho = jnp.where(is_eq, base_rho * cfg.rho_eq_scale, base_rho)
        if soft is not None and cfg.soft_rho_power > 0.0:
            p = cfg.soft_rho_power
            rho_soft = base_rho ** (1.0 - p) * jnp.maximum(soft, 1e-12) ** p
            rho = jnp.where(is_soft, jnp.maximum(rho_soft, base_rho), rho)
        iters = per_phase if k < n_phases - 1 else cfg.iters - per_phase * (n_phases - 1)
        x, z, y = phase(x, z, y, rho, iters)
        if k < n_phases - 1:
            base_rho = rebalance(base_rho, x, z, y)

    # unscale: x = D x_bar, y = E y_bar / c
    x = D * x
    y = E * y / c
    l0, u0 = _clip_bounds(qp.l, qp.u)
    Ax = qp.A @ x
    z = jnp.clip(Ax, l0, u0)
    viol = jnp.abs(Ax - z)
    if qp.soft is not None:
        # soft rows cannot be violated; their optimality is dual consistency
        # y = soft * neg(Ax - l), which feeds r_dual via stationarity.
        z = jnp.where(qp.soft > 0.0, Ax, z)
        viol = jnp.where(qp.soft > 0.0, 0.0, viol)
    r_prim = jnp.max(viol)
    r_dual = jnp.max(jnp.abs(qp.P_diag * x + qp.q + qp.A.T @ y))
    return x, y, z, r_prim, r_dual


def kkt_error(P, q, A, l, u, x, y, soft=None):
    """Full KKT error: stationarity, primal feasibility, complementarity.

    Soft (penalty) rows replace feasibility/complementarity with dual
    consistency: y_i must equal the penalty gradient soft_i*neg(A_i x - l_i).
    """
    Ax = A @ x
    stat = jnp.max(jnp.abs(P * x + q + A.T @ y))
    viol_r = jnp.maximum(jnp.maximum(Ax - u, l - Ax), 0.0)
    y_pos = jnp.maximum(y, 0.0)
    y_neg = jnp.maximum(-y, 0.0)
    comp_u_r = jnp.minimum(y_pos, jnp.abs(u - Ax))
    comp_l_r = jnp.minimum(y_neg, jnp.abs(Ax - l))
    if soft is not None:
        is_soft = soft > 0.0
        dual_err = jnp.abs(y - soft * jnp.minimum(Ax - l, 0.0))
        viol_r = jnp.where(is_soft, dual_err, viol_r)
        comp_u_r = jnp.where(is_soft, 0.0, comp_u_r)
        comp_l_r = jnp.where(is_soft, 0.0, comp_l_r)
    viol = jnp.max(viol_r)
    comp_u = jnp.max(comp_u_r)
    comp_l = jnp.max(comp_l_r)
    return jnp.maximum(jnp.maximum(stat, viol), jnp.maximum(comp_u, comp_l))


def _polish_candidate(qp: QPData, cfg: ADMMConfig, low_act, up_act,
                      soft_act=None):
    """Solve the masked active-set KKT system for one active-set guess.

    Uses all m rows with a mask so shapes stay static: inactive rows decouple
    into y_i = -g2_i equations.  TPU-friendly formulation: the equality-
    constrained QP is solved in *primal penalty* form
        (diag(P+s) + beta DA' DA) x = g1 + beta DA' g2,
        y = beta d (DA x - g2) - (1-d) g2
    whose (n, n) SPD matrix is inverted by Newton-Schulz matmuls — both the
    (m, m) dual Schur complement (m ~ 1.7 n here) and any Cholesky/LU path
    measured several times the cost of the whole ADMM run on TPU.  Iterative
    refinement against the exact (unregularized) KKT operator removes both
    the s-regularization and the O(1/beta) penalty error geometrically
    (augmented-Lagrangian contraction).

    Soft (penalty) rows guessed active (``soft_act``) enter the objective
    exactly — 0.5*soft*(A_i x - l_i)^2 is quadratic once the active side is
    fixed — so they add soft_i a_i a_i' to H and soft_i l_i a_i to the
    gradient target, with NO penalty-approximation error to refine away.
    Returns (x_pol, y_pol, finite_ok).
    """
    P, q, A = qp.P_diag, qp.q, qp.A
    l, u = _clip_bounds(qp.l, qp.u)
    is_eq = (u - l) < 1e-9
    is_soft = None if qp.soft is None else qp.soft > 0.0

    row_norm_sq = jnp.sum(A * A, axis=1)
    active = (low_act | up_act | is_eq) & (row_norm_sq > 1e-16)
    if is_soft is not None:
        active = active & ~is_soft
    d = active.astype(P.dtype)
    b_act = jnp.where(is_eq, l, jnp.where(up_act, u, l))
    b_act = jnp.where(active, b_act, 0.0)

    DA = A * d[:, None]
    # Row-normalize the active rows so the penalty's spectrum is set by the
    # active-set geometry, not by arbitrary constraint row scales.
    rn = jnp.sqrt(jnp.sum(DA * DA, axis=1))
    rs = jnp.where(active, 1.0 / jnp.maximum(rn, 1e-8), 0.0)
    DAn = DA * rs[:, None]

    # The hard-row penalty must dominate the objective curvature along the
    # constraint normals, which INCLUDES the active-soft Gauss-Newton term
    # (its lambda_max can reach ~1e5 while max(P) ~ 2 for NRMP); otherwise
    # the refinement contraction lambda/(lambda+beta) ~ 1 and the penalty
    # constraint error never leaves.  trace(SA'SA) is a cheap upper bound.
    curv = jnp.max(P)
    if soft_act is None:
        soft_grad = None
    else:
        # exact quadratic contribution of active soft rows
        ssd = jnp.sqrt(qp.soft * soft_act.astype(P.dtype))
        SA = A * ssd[:, None]
        g3 = ssd * l
        SAtg3 = SA.T @ g3
        curv = curv + jnp.sum(SA * SA)

        def soft_grad(x):
            return SA.T @ (SA @ x) - SAtg3

    beta = cfg.polish_beta * (curv + 1.0)

    # s_reg trades IR contraction rate against cond(H): the slow IR mode is
    # s_reg/(s_reg + lam) against the smallest true curvature lam along
    # unconstrained directions.  1e-3 + beta=10*curv measured the sweet
    # spot on real corridor instances (first penalty solve already ~1e-3
    # stationarity, refinement to the f32 floor in <= 5 steps); a
    # curvature-scaled s_reg looked safer on paper but slowed the s-mode
    # contraction to ~0.5/step and lost 100x final accuracy.
    s_reg = 1e-3
    Pr = P + s_reg

    H = jnp.diag(Pr) + beta * (DAn.T @ DAn)
    if soft_act is not None:
        H = H + SA.T @ SA

    Hinv = _spd_inverse(H, cfg)

    def kkt_solve(g1, g2):
        """Approximately solve Pop x + DA' y = g1 ; DA x - (1-d) y = g2,
        where Pop = diag(P) + active-soft Gauss-Newton term (inside H)."""
        g2n = g2 * rs
        x = Hinv @ (g1 + beta * (DAn.T @ g2n))
        y = d * (beta * (DAn @ x - g2n)) * rs - (1.0 - d) * g2
        return x, y

    g1_0 = -q if soft_grad is None else -q + SAtg3
    x, y = kkt_solve(g1_0, b_act)

    # refinement against the exact KKT operator (true P, no s_reg/penalty;
    # the soft term is exact in H, so only hard-penalty error contracts)
    for _ in range(cfg.refine_steps):
        r1 = -q - (P * x + DA.T @ y)
        if soft_grad is not None:
            r1 = r1 - soft_grad(x)
        r2 = b_act - (DA @ x - (1.0 - d) * y)
        dx, dy = kkt_solve(r1, r2)
        x = x + dx
        y = y + dy

    # Dual recovery: the penalty-formula duals y = beta*(DAn x - b)*rs are a
    # difference quotient — beta ~ 1e5 times an O(f32 eps) residual leaves
    # O(1e-2) dual noise even when the primal is exact, which poisons the
    # KKT-error-based candidate selection, the VJP's dual-sign active-set
    # detection, and the ADMM warm start.  Recover the duals by least
    # squares against stationarity instead:
    #     min_y || P x + q + soft_grad(x) + DAn' y_n ||,  y = y_n * rs
    # via the (m, m) masked normal equations (unit-normalized active rows
    # keep the Gram conditioned by geometry only).
    if cfg.dual_recovery:
        r_stat = -q - P * x
        if soft_grad is not None:
            r_stat = r_stat - soft_grad(x)
        # Solve with the (m, m) ROW Gram, not the (n, n) column Gram: the
        # rhs DAn r lies in range(DAn) = range(row Gram), so the ridge
        # never amplifies a null-space component.  (The algebraically
        # equivalent n-form y = DAn (DAn'DAn + t)^-1 r was measured to
        # inject ~6e-2 dual noise in f32: r has null(DAn')-components that
        # get amplified by 1/t before the outer DAn cancels them only in
        # exact arithmetic.)  The diag(1-d) block decouples inactive rows;
        # the 1e-6 ridge (rows unit-normalized) picks min-norm multipliers
        # when active rows are linearly dependent.
        m_dim = DAn.shape[0]
        Gm = DAn @ DAn.T + jnp.diag((1.0 - d) + 1e-6)
        y_n = _spd_inverse(Gm, cfg) @ (DAn @ r_stat)
        y = d * y_n * rs

    if is_soft is not None:
        # duals of soft rows are the (true, piecewise) penalty gradient
        y = jnp.where(is_soft, qp.soft * jnp.minimum(A @ x - l, 0.0), y)

    ok = jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(y))
    return x, y, ok


def _polish(qp: QPData, cfg: ADMMConfig, x: jnp.ndarray, y: jnp.ndarray):
    """Active-set polish with two candidate active sets.

    Candidate 1 (OSQP-style): active where the dual is clearly signed.
    Candidate 2: additionally activates rows whose constraint value sits
    within the achieved ADMM accuracy of a bound (catches weakly-active
    rows whose duals are still small).  The candidate with the smallest
    full KKT error wins; the ADMM iterate is the fallback.
    """
    P, q, A = qp.P_diag, qp.q, qp.A
    l, u = _clip_bounds(qp.l, qp.u)

    Ax = A @ x
    viol = jnp.abs(Ax - jnp.clip(Ax, l, u))
    if qp.soft is not None:
        viol = jnp.where(qp.soft > 0.0, 0.0, viol)
    rp = jnp.max(viol)
    tol = jnp.clip(10.0 * rp, 1e-5, 1e-2)

    low1, up1 = y < -cfg.eps_act, y > cfg.eps_act
    low2 = low1 | (Ax - l < tol)
    up2 = up1 | (u - Ax < tol)

    if qp.soft is None:
        sact1 = sact2 = None
    else:
        is_soft = qp.soft > 0.0
        sact1 = is_soft & (y < -cfg.eps_act)
        sact2 = is_soft & (Ax - l < tol)
        low1, low2 = low1 & ~is_soft, low2 & ~is_soft
        up1, up2 = up1 & ~is_soft, up2 & ~is_soft

    # NOTE: batching the two candidates into one vmapped solve was measured
    # ~9% SLOWER end-to-end on TPU (worse XLA lowering of the stacked
    # Newton-Schulz matmuls) with no latency benefit — keep them sequential.
    x1, y1, ok1 = _polish_candidate(qp, cfg, low1, up1, sact1)
    x2, y2, ok2 = _polish_candidate(qp, cfg, low2, up2, sact2)

    big = jnp.asarray(jnp.inf, P.dtype)
    e0 = kkt_error(P, q, A, l, u, x, y, qp.soft)
    e1 = jnp.where(ok1, kkt_error(P, q, A, l, u, x1, y1, qp.soft), big)
    e2 = jnp.where(ok2, kkt_error(P, q, A, l, u, x2, y2, qp.soft), big)

    # A polished candidate replaces the ADMM iterate only when it is
    # *clearly* better (margin), never on a near-tie.  On degenerate
    # instances the polish and ADMM points can have near-equal KKT error
    # while sitting ~1e-3 apart; a bare e1 <= e0 comparison then flips with
    # compile-path roundoff (vmap vs single lowering), making the planner
    # output chaotic in its inputs.  The margin keeps the selection stable:
    # whichever path wins, it wins in every compilation of the same problem.
    margin = 0.3
    use1 = (e1 <= margin * e0) & (e1 <= e2)
    use2 = (e2 <= margin * e0) & ~use1
    x_out = jnp.where(use1, x1, jnp.where(use2, x2, x))
    y_out = jnp.where(use1, y1, jnp.where(use2, y2, y))
    e_out = jnp.where(use1, e1, jnp.where(use2, e2, e0))
    polished = use1 | use2

    # guess source for further rounds: the best point TRIED, even when the
    # margin rejected it for output — a rejected candidate is still usually
    # far closer to the optimum than the ADMM iterate, so its constraint
    # values/duals give a much better active-set guess.
    g1_best = e1 <= jnp.minimum(e0, e2)
    g2_best = (e2 <= jnp.minimum(e0, e1)) & ~g1_best
    x_g = jnp.where(g1_best, x1, jnp.where(g2_best, x2, x))
    y_g = jnp.where(g1_best, y1, jnp.where(g2_best, y2, y))
    e_g = jnp.minimum(e0, jnp.minimum(e1, e2))

    # Iterated polish = one step of a primal active-set method per round,
    # warm-started from the best point tried.  The re-guess follows the
    # classic add/drop rules — value-based re-guessing has a dead fixed
    # point (enforced rows sit exactly at their bounds, so they would stay
    # "active" forever; a wrongly-active soft row is pinned at its bound by
    # its now two-sided Gauss-Newton term):
    #   ADD  rows strictly violated at the guess point;
    #   DROP rows whose multiplier has the wrong sign (kept only when the
    #        dual sign certifies activity).
    # Measured on real corridor instances (scripts/exp_control_accuracy.py):
    # the round-1 guesses from the noisy ADMM duals leave ~1e-2..1 KKT
    # error on hinge-active steps; one add/drop round recovers the set.
    for _ in range(max(int(cfg.polish_rounds) - 1, 0)):
        Axb = A @ x_g
        low_r = (y_g < -cfg.eps_act) | (Axb - l < -1e-6)
        up_r = (y_g > cfg.eps_act) | (u - Axb < -1e-6)
        if qp.soft is None:
            sact_r = None
        else:
            sact_r = is_soft & ((y_g < -cfg.eps_act) | (Axb - l < -1e-6))
            low_r = low_r & ~is_soft
            up_r = up_r & ~is_soft
        x3, y3, ok3 = _polish_candidate(qp, cfg, low_r, up_r, sact_r)
        e3 = jnp.where(ok3, kkt_error(P, q, A, l, u, x3, y3, qp.soft), big)
        # output update keeps the stability margin vs the CURRENT output
        use3 = e3 <= margin * e_out
        x_out = jnp.where(use3, x3, x_out)
        y_out = jnp.where(use3, y3, y_out)
        e_out = jnp.where(use3, e3, e_out)
        polished = polished | use3
        # guess update is a plain argmin (no margin needed for guessing)
        g3 = e3 < e_g
        x_g = jnp.where(g3, x3, x_g)
        y_g = jnp.where(g3, y3, y_g)
        e_g = jnp.where(g3, e3, e_g)

    return x_out, y_out, None, None, polished


def _solve_single(qp: QPData, cfg: ADMMConfig,
                  x0: jnp.ndarray, y0: jnp.ndarray,
                  struct=None) -> QPSolution:
    # The solver's accuracy contract (<= 1e-3 control error vs the reference
    # solver) requires exact f32 matmuls: block bf16 fast paths (TPU MXU
    # default, CPU AMX) for everything inside the solve.
    with jax.default_matmul_precision("highest"):
        x, y, z, rp, rd = _admm_core(qp, cfg, x0, y0, struct)
        if cfg.polish:
            x, y, _, _, _ = _polish(qp, cfg, x, y)
            l, u = _clip_bounds(qp.l, qp.u)
            Ax = qp.A @ x
            z = jnp.clip(Ax, l, u)
            viol = jnp.abs(Ax - z)
            if qp.soft is not None:
                z = jnp.where(qp.soft > 0.0, Ax, z)
                viol = jnp.where(qp.soft > 0.0, 0.0, viol)
            rp = jnp.max(viol)
            rd = jnp.max(jnp.abs(qp.P_diag * x + qp.q + qp.A.T @ y))
    return QPSolution(x=x, y=y, z=z, r_prim=rp, r_dual=rd)


# ---------------------------------------------------------------------------
# Public API with implicit differentiation
# ---------------------------------------------------------------------------

def solve_qp(qp: QPData, cfg: ADMMConfig,
             x0: Optional[jnp.ndarray] = None,
             y0: Optional[jnp.ndarray] = None,
             struct=None) -> QPSolution:
    """Solve one QP (unbatched).  Differentiable w.r.t. qp fields.

    ``struct`` = ((matvec, rmatvec), blocks) optionally provides a factored
    constraint operator for the ADMM scan body (see _admm_core).  Gradients
    always flow through the dense qp fields (the blocks duplicate values
    already inside qp.A, so they carry zero cotangent).

    For batches, vmap this function (see ``solve_qp_batch``).
    """
    n, m = qp.P_diag.shape[0], qp.A.shape[0]
    if x0 is None:
        x0 = jnp.zeros((n,), dtype=qp.P_diag.dtype)
    if y0 is None:
        y0 = jnp.zeros((m,), dtype=qp.P_diag.dtype)
    if struct is None:
        mv_fns, blocks = None, None
    else:
        mv_fns, blocks = struct
    return _solve_qp_vjp(qp, cfg, mv_fns, x0, y0, blocks)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _solve_qp_vjp(qp: QPData, cfg: ADMMConfig, mv_fns,
                  x0: jnp.ndarray, y0: jnp.ndarray, blocks) -> QPSolution:
    struct = None if mv_fns is None else (mv_fns, blocks)
    return _solve_single(qp, cfg, x0, y0, struct)


def _solve_fwd(qp, cfg, mv_fns, x0, y0, blocks):
    struct = None if mv_fns is None else (mv_fns, blocks)
    sol = _solve_single(qp, cfg, x0, y0, struct)
    return sol, (qp, sol.x, sol.y, blocks)


def _solve_bwd(cfg, mv_fns, res, g):
    """Implicit differentiation through the active-set KKT conditions.

    At the solution: P x + q + A' y = 0 and, for active rows, A_i x = b_i.
    Differentiating gives the adjoint system K0' [dx; dnu] = [g_x; 0]; the
    parameter gradients follow the OptNet formulas restricted to diagonal P.
    The structured blocks replicate values already present in qp.A, so the
    full parameter gradient flows through dqp alone; the blocks receive
    zero cotangent (anything else would double-count).
    """
    qp, x, y, blocks = res
    with jax.default_matmul_precision("highest"):
        dqp, dx0, dy0 = _solve_bwd_impl(cfg, qp, x, y, g)
    dblocks = jax.tree.map(jnp.zeros_like, blocks)
    return (dqp, dx0, dy0, dblocks)


def _solve_bwd_impl(cfg, qp, x, y, g):
    P, q, A = qp.P_diag, qp.q, qp.A
    l, u = _clip_bounds(qp.l, qp.u)
    n, m = P.shape[0], A.shape[0]
    is_eq = (u - l) < 1e-9
    low_act = y < -cfg.eps_act
    up_act = y > cfg.eps_act
    active = low_act | up_act | is_eq
    d = active.astype(P.dtype)
    DA = A * d[:, None]

    delta = cfg.polish_delta
    # Diagonal of the dual block.  Hard rows: -delta if active (equality
    # A_i x = b_i), -delta-1 if inactive (y_i = 0).  Soft penalty rows with
    # y_i = soft*(A_i x - l_i) < 0 satisfy the *relaxed* active equation
    # A_i x - y_i/soft_i = l_i, i.e. a -1/soft_i diagonal entry.
    diag2 = -delta - (1.0 - d)
    if qp.soft is not None:
        s_act = (qp.soft > 0.0) & low_act
        diag2 = jnp.where(
            s_act, -delta - 1.0 / jnp.maximum(qp.soft, 1e-12), diag2)

    K = jnp.zeros((n + m, n + m), dtype=P.dtype)
    K = K.at[:n, :n].set(jnp.diag(P + delta))
    K = K.at[:n, n:].set(DA.T)
    K = K.at[n:, :n].set(DA)
    K = K.at[n:, n:].set(jnp.diag(diag2))

    gx = g.x  # only propagate cotangents of the primal solution
    rhs = jnp.concatenate([gx, jnp.zeros((m,), dtype=P.dtype)])
    sol = jnp.linalg.solve(K.T, rhs)
    dx, dnu = sol[:n], sol[n:]
    dnu = dnu * d  # inactive rows carry no sensitivity

    dP = -dx * x                       # diagonal of -(dx x' + x dx')/2 * 2
    dq = -dx
    dA = -(jnp.outer(dnu, x) + jnp.outer(y * d, dx))
    db = dnu
    dl = jnp.where(active & ~up_act, db, 0.0)
    du = jnp.where(up_act, db, 0.0)

    if qp.soft is None:
        dsoft = None
    else:
        dsoft = jnp.where(
            s_act, -dnu * y / jnp.maximum(qp.soft, 1e-12) ** 2, 0.0)

    dqp = QPData(P_diag=dP, q=dq, A=dA, l=dl, u=du, soft=dsoft)
    return (dqp, jnp.zeros_like(x), jnp.zeros_like(y))


_solve_qp_vjp.defvjp(_solve_fwd, _solve_bwd)


def solve_qp_batch(qp: QPData, cfg: ADMMConfig,
                   x0: Optional[jnp.ndarray] = None,
                   y0: Optional[jnp.ndarray] = None) -> QPSolution:
    """Solve a batch of QPs: every QPData field has a leading batch axis."""
    B = qp.P_diag.shape[0]
    n, m = qp.P_diag.shape[1], qp.A.shape[1]
    if qp.soft is not None and qp.soft.ndim == 1:
        qp = qp._replace(soft=jnp.broadcast_to(qp.soft, (B, m)))
    if x0 is None:
        x0 = jnp.zeros((B, n), dtype=qp.P_diag.dtype)
    if y0 is None:
        y0 = jnp.zeros((B, m), dtype=qp.P_diag.dtype)
    return jax.vmap(lambda qp_, x0_, y0_: solve_qp(qp_, cfg, x0_, y0_))(qp, x0, y0)
