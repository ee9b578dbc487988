"""NRMP — Neural Regularized Motion Planner, QP assembly for the TPU solver.

Replaces the reference's cvxpy problem construction + CvxpyLayer call
(reference: blocks/nrmp.py:263-304, robot/robot.py:73-236) with a direct,
fully-vectorized assembly of an OSQP-standard-form QP consumed by
``neupan_tpu.ops.qp``.

Mathematical parity with the reference problem:

  variables   s in R^{3x(T+1)}, u in R^{2xT}, d in R^T
  objective   ||q_s s - q_s ref_s||^2  (omni: x,y rows only)
            + ||p_u u[0,:] - p_u ref_us||^2
            + 0.5 bk ||s - nom_s||^2
            + 0.5 reg_u ||u - nom_u||^2 + 0.5 reg_d ||d||^2   <- see NRMPSpec
            - eta sum(d)
            + 0.5 ro_obs ||neg(fa p - fb - d)||^2   <- hinge penalty
  subject to  s_{t+1} = A_t s_t + B_t u_t + C_t
              s_0 = nom_s_0
              |u_{t+1} - u_t| <= acce_bound,  |u| <= speed_bound
              max(d_min, 0) <= d <= d_max

The hinge penalty is expressed directly as *soft* rows of the QP
(``QPData.soft``, weight ro_obs, lower target fb): the solver's z-prox
handles the one-sided quadratic exactly, so no slack variables are needed.
This keeps the problem at n = 5T+3+2T variables and m = 8T+1+TK rows
(vs +TK variables and +2TK rows for the slack reformulation) — the dense
factorizations in the solver are the dominant per-step cost and scale
cubically in n, so this is the difference between a 163x163 and a 63x63
inverse at T=10, K=10.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neupan_tpu.ops.qp import QPData

_INF = 1e20


class AdjustParams(NamedTuple):
    """Runtime-tunable, differentiable weights (reference nrmp.py:79-104)."""

    q_s: jnp.ndarray   # scalar () or (3,) / (3,1)
    p_u: jnp.ndarray   # scalar
    eta: jnp.ndarray   # scalar
    d_max: jnp.ndarray # scalar
    d_min: jnp.ndarray # scalar


@dataclasses.dataclass(frozen=True)
class NRMPSpec:
    """Static problem description (hashable; jit static argument)."""

    T: int
    K: int                      # nrmp_max_num (0 => no-obstacle problem)
    kinematics: str
    speed_bound: Tuple[float, float]
    acce_bound: Tuple[float, float]
    ro_obs: float = 400.0
    bk: float = 0.1
    # Proximal/ridge regularization of the flat objective directions.  The
    # reference problem is only PSD: omega (u[:,1]) has no quadratic term
    # and d's objective is linear (-eta*d), so the optimum can sit on a
    # near-degenerate face and WHICH face point a solver returns is set by
    # solver noise — measured on recorded corridor instances, optimal points
    # with equal objective (gap ~1e-6) differ by ~1e-2 in the commanded
    # action, which makes closed-loop outcomes chaotic in the solver budget
    # (BASELINE.md round-2 record; the reference escapes this because ECOS'
    # interior-point path selects the analytic center of the optimal face).
    # reg_u extends the reference's own proximal term (reference
    # robot.py:172-180, states only) to the controls: 0.5*reg_u*||u-nom_u||^2
    # vanishes at the PAN fixed point (u = nom_u there), so converged
    # trajectories are unchanged, while degenerate-face selection becomes
    # deterministic hysteresis toward the previous tick's plan.  reg_d is a
    # plain ridge 0.5*reg_d*||d||^2 (no natural proximal center for d);
    # it shifts the eta trade-off by ~reg_d*d/eta < 1% at the defaults.
    # Measured effect (scripts/exp_solver_lab.py, 197 recorded instances):
    # budget-sensitivity frac(|du0|>1e-3) between 150- and 300-iteration
    # solves drops 0.16 -> 0.05 with dual recovery on.
    #
    # ROUND-5 DEFAULTS (the reg ladder, BASELINE.md "Round 5: the reg
    # ladder" + BENCH_REG_LADDER.json): the regularization also MOVES the
    # reference formulation's optimum — up to 0.25 in u0 at the old 0.1.
    # The two knobs carry different loads: reg_d is the solver-robustness
    # knob (the d/omega flat directions are what broke the round-2
    # polish; at reg_d=1e-3 polygon_robot and corridor_long stall), while
    # reg_u carries most of the action deviation.  reg_u=1e-3 +
    # reg_d=1e-2, with the fused-kernel budget (ADMMConfig round-5
    # defaults), measures |u0 - u0_ref-form| p50 2.3e-4 / p90 4.8e-3 /
    # max 1.04e-2 — equal to the pure formulation shift (no solver
    # noise) — with the optimality contract and the 26-scenario sweep
    # both PASS.
    reg_u: float = 0.001
    reg_d: float = 0.01

    @property
    def no_obs(self) -> bool:
        return self.K == 0

    @property
    def n_s(self) -> int:
        return 3 * (self.T + 1)

    @property
    def n_u(self) -> int:
        return 2 * self.T

    @property
    def n(self) -> int:
        if self.no_obs:
            return self.n_s + self.n_u
        return self.n_s + self.n_u + self.T

    @property
    def off_u(self) -> int:
        return self.n_s

    @property
    def off_d(self) -> int:
        return self.n_s + self.n_u

    @property
    def m(self) -> int:
        base = 3 * self.T + 3 + 2 * (self.T - 1) + 2 * self.T
        if self.no_obs:
            return base
        return base + self.T + self.T * self.K

    # row offsets
    @property
    def r_init(self) -> int:
        return 3 * self.T

    @property
    def r_acc(self) -> int:
        return self.r_init + 3

    @property
    def r_spd(self) -> int:
        return self.r_acc + 2 * (self.T - 1)

    @property
    def r_d(self) -> int:
        return self.r_spd + 2 * self.T

    @property
    def r_obs(self) -> int:
        return self.r_d + self.T


def _static_template(spec: NRMPSpec) -> np.ndarray:
    """Constant entries of the constraint matrix A (m, n)."""
    T, K = spec.T, spec.K
    A0 = np.zeros((spec.m, spec.n), dtype=np.float32)

    # dynamics rows: -I on s_{t+1}
    for t in range(T):
        for r in range(3):
            A0[3 * t + r, 3 * (t + 1) + r] = -1.0
    # init rows: I on s_0
    for r in range(3):
        A0[spec.r_init + r, r] = 1.0
    # acceleration rows: u_{t+1} - u_t
    for t in range(T - 1):
        for j in range(2):
            row = spec.r_acc + 2 * t + j
            A0[row, spec.off_u + 2 * (t + 1) + j] = 1.0
            A0[row, spec.off_u + 2 * t + j] = -1.0
    # speed rows: I on u
    for t in range(T):
        for j in range(2):
            A0[spec.r_spd + 2 * t + j, spec.off_u + 2 * t + j] = 1.0
    if not spec.no_obs:
        # d box rows
        for t in range(T):
            A0[spec.r_d + t, spec.off_d + t] = 1.0
        # obstacle (soft penalty) rows: -1 on d_t; fa scattered at build time
        for t in range(T):
            for i in range(K):
                A0[spec.r_obs + t * K + i, spec.off_d + t] = -1.0
    return A0


def _dyn_indices(spec: NRMPSpec):
    """Index grids for scattering A_t / B_t blocks into the dyn rows."""
    T = spec.T
    t = np.arange(T)[:, None, None]
    r = np.arange(3)[None, :, None]
    rows_a = np.broadcast_to(3 * t + r, (T, 3, 3))
    cols_a = np.broadcast_to(3 * t + np.arange(3)[None, None, :], (T, 3, 3))
    rows_b = np.broadcast_to(3 * t + r, (T, 3, 2))
    cols_b = np.broadcast_to(
        spec.off_u + 2 * t + np.arange(2)[None, None, :], (T, 3, 2)
    )
    return rows_a, cols_a, rows_b, cols_b


def _obs_indices(spec: NRMPSpec):
    T, K = spec.T, spec.K
    t = np.arange(T)[:, None, None]
    i = np.arange(K)[None, :, None]
    rows = np.broadcast_to(spec.r_obs + t * K + i, (T, K, 2))
    cols = np.broadcast_to(3 * (t + 1) + np.arange(2)[None, None, :], (T, K, 2))
    return rows, cols


def build_qp(
    spec: NRMPSpec,
    adjust: AdjustParams,
    nom_s: jnp.ndarray,     # (3, T+1)
    nom_u: jnp.ndarray,     # (2, T)  linearization point + reg_u prox center
    ref_s: jnp.ndarray,     # (3, T+1)
    ref_us: jnp.ndarray,    # (T,)
    A_dyn: jnp.ndarray,     # (T, 3, 3)
    B_dyn: jnp.ndarray,     # (T, 3, 2)
    C_dyn: jnp.ndarray,     # (T, 3, 1)
    fa: Optional[jnp.ndarray] = None,   # (T, K, 2)
    fb: Optional[jnp.ndarray] = None,   # (T, K)
) -> QPData:
    """Assemble the NRMP QP in OSQP standard form."""
    T, K = spec.T, spec.K
    dtype = nom_s.dtype

    q_s_vec = jnp.broadcast_to(jnp.reshape(adjust.q_s, (-1,)), (3,)).astype(dtype)
    p_u = adjust.p_u.astype(dtype)

    # state-cost mask: omni uses x,y rows only (robot.py:163-166)
    m_s = jnp.asarray(
        [1.0, 1.0, 0.0] if spec.kinematics == "omni" else [1.0, 1.0, 1.0],
        dtype=dtype,
    )

    # ---- objective -------------------------------------------------------
    w_s = m_s * q_s_vec**2                       # (3,)
    P_s = jnp.tile(2.0 * w_s + spec.bk, T + 1)   # (3(T+1),)
    q_lin_s = (-2.0 * w_s[:, None] * ref_s - spec.bk * nom_s).T.reshape(-1)

    # control proximal (see NRMPSpec.reg_u): adds reg_u to BOTH u channels'
    # curvature and centers the term at nom_u
    P_u = jnp.tile(jnp.stack([2.0 * p_u**2 + spec.reg_u,
                              jnp.full_like(p_u, spec.reg_u)]), T)
    nom_u_flat = nom_u.T.reshape(-1)                 # (2T,) matching u order
    q_lin_u = jnp.stack(
        [-2.0 * p_u**2 * ref_us, jnp.zeros_like(ref_us)], axis=-1
    ).reshape(-1) - spec.reg_u * nom_u_flat

    if spec.no_obs:
        P_diag = jnp.concatenate([P_s, P_u])
        q_lin = jnp.concatenate([q_lin_s, q_lin_u])
    else:
        P_d = jnp.full((T,), spec.reg_d, dtype)
        q_lin_d = jnp.full((T,), -1.0, dtype) * adjust.eta.astype(dtype)
        P_diag = jnp.concatenate([P_s, P_u, P_d])
        q_lin = jnp.concatenate([q_lin_s, q_lin_u, q_lin_d])

    # ---- constraint matrix ----------------------------------------------
    A = jnp.asarray(_static_template(spec), dtype=dtype)
    rows_a, cols_a, rows_b, cols_b = _dyn_indices(spec)
    A = A.at[rows_a, cols_a].set(A_dyn.astype(dtype))
    A = A.at[rows_b, cols_b].set(B_dyn.astype(dtype))
    if not spec.no_obs:
        rows_o, cols_o = _obs_indices(spec)
        A = A.at[rows_o, cols_o].set(fa.astype(dtype))

    # ---- bounds ----------------------------------------------------------
    neg_C = -C_dyn[:, :, 0].reshape(-1)          # (3T,)
    s0 = nom_s[:, 0]
    acce = jnp.tile(jnp.asarray(spec.acce_bound, dtype), T - 1)
    speed = jnp.tile(jnp.asarray(spec.speed_bound, dtype), T)

    l_parts = [neg_C, s0, -acce, -speed]
    u_parts = [neg_C, s0, acce, speed]
    soft = None
    if not spec.no_obs:
        d_lo = jnp.full((T,), 1.0, dtype) * jnp.maximum(adjust.d_min, 0.0)
        d_hi = jnp.full((T,), 1.0, dtype) * adjust.d_max
        # obstacle rows are soft: 0.5*ro_obs*neg(fa p - d - fb)^2
        obs_lo = fb.reshape(-1).astype(dtype)
        obs_hi = jnp.full((T * K,), _INF, dtype)
        l_parts += [d_lo, obs_lo]
        u_parts += [d_hi, obs_hi]
        soft = jnp.concatenate([
            jnp.zeros((spec.r_obs,), dtype),
            jnp.full((T * K,), spec.ro_obs, dtype),
        ])

    l = jnp.concatenate(l_parts)
    u = jnp.concatenate(u_parts)

    return QPData(P_diag=P_diag, q=q_lin, A=A, l=l, u=u, soft=soft)


def condensation(spec: NRMPSpec, A_dyn: jnp.ndarray, B_dyn: jnp.ndarray,
                 C_dyn: jnp.ndarray, s0: jnp.ndarray):
    """Analytic nullspace basis of the equality block (dynamics + init).

    The dynamics/init equalities are ALWAYS active, so the polish EQP can
    eliminate them once per QP instead of factoring them into every
    candidate's Schur complement: any feasible x = Z w + xp with
    w = (u, d) in R^{2T+T}, where the s-block of Z is the linearized
    rollout sensitivity ds/du (a T-step scan) and xp is the zero-input
    rollout.  This shrinks the per-candidate factorizations from
    (n, n) + (m, m) to (2T+T, 2T+T) + (n_hard, n_hard) — for T=10 that is
    63^3 + 114^3 -> 30^3 + 48^3 per EQP solve, ~14x fewer factorization
    flops (see ops/qp.py ADMMConfig.elim_n_eq).

    Returns (Z (n, 3T), xp (n,)) in the solver's variable ordering.
    """
    T = spec.T
    k = 2 * T if spec.no_obs else 3 * T  # controls (+ distances)
    dtype = A_dyn.dtype

    # s-sensitivity to u: M_{t+1} = A_t M_t + B_t E_t  (E_t injects u_t).
    # UNROLLED python loop (T is static): as a lax.scan this was one of the
    # two dominant while-loops of the round-5 B=512 profile (~2 ms/step
    # each with its dynamic-update-slices) — tiny (3, 2T) per-iteration
    # bodies are pure launch overhead, while the unrolled chain fuses.
    M = jnp.zeros((3, 2 * T), dtype)
    rows = [M]
    for t in range(T):
        M = A_dyn[t] @ M
        M = M.at[:, 2 * t:2 * t + 2].add(B_dyn[t])   # static slice
        rows.append(M)
    S_u = jnp.stack(rows)                            # (T+1, 3, 2T)

    # concat construction (no scatters: the .at[].set writes into the
    # (n, k) buffer cost ~1.3 ms/step at B=512 — round-5 profile).  Only
    # the s-block varies per scenario; the u/d identity blocks are
    # constants.
    s_block = S_u.reshape(-1, 2 * T)                 # (3(T+1), 2T)
    if spec.no_obs:
        top = s_block
        mid = jnp.eye(2 * T, dtype=dtype)
        Z = jnp.concatenate([top, mid], axis=0)
    else:
        top = jnp.concatenate(
            [s_block, jnp.zeros((spec.n_s, T), dtype)], axis=1)
        mid = jnp.concatenate(
            [jnp.eye(2 * T, dtype=dtype), jnp.zeros((2 * T, T), dtype)],
            axis=1)
        bot = jnp.concatenate(
            [jnp.zeros((T, 2 * T), dtype), jnp.eye(T, dtype=dtype)], axis=1)
        Z = jnp.concatenate([top, mid, bot], axis=0)

    # particular solution: zero-input rollout from s0 (unrolled, as above)
    s = s0
    s_rows = [s0]
    for t in range(T):
        s = A_dyn[t] @ s + C_dyn[t][:, 0]
        s_rows.append(s)
    s_all = jnp.stack(s_rows)                        # (T+1, 3)
    xp = jnp.concatenate(
        [s_all.reshape(-1), jnp.zeros((spec.n - spec.n_s,), dtype)])
    return Z, xp


def unpack_solution(spec: NRMPSpec, x: jnp.ndarray):
    """Split the stacked primal vector into (s (3,T+1), u (2,T), d (T,))."""
    T = spec.T
    s = x[: spec.n_s].reshape(T + 1, 3).T
    u = x[spec.off_u: spec.off_u + spec.n_u].reshape(T, 2).T
    if spec.no_obs:
        d = None
    else:
        d = x[spec.off_d: spec.off_d + T]
    return s, u, d


def coefficients_from_dune(spec: NRMPSpec, mu_k, lam_k, points_k, valid_k,
                           h: jnp.ndarray, has_points: jnp.ndarray):
    """Build the (fa, fb) obstacle coefficients for frames 1..T.

    Parity with reference nrmp.py:220-261: fa = lam', fb = lam'p + mu'h per
    sorted point; slots beyond the number of available points replicate the
    closest point's row; when there are no points at all, fa = fb = 0.

    Args:
        mu_k: (T+1, E, K), lam_k: (T+1, 2, K), points_k: (T+1, 2, K),
        valid_k: (T+1, K) bool, h: (E, 1), has_points: scalar bool.
    Returns:
        fa (T, K, 2), fb (T, K)
    """
    T, K = spec.T, spec.K
    lam_f = lam_k[1:]                              # (T, 2, K)
    mu_f = mu_k[1:]                                # (T, E, K)
    pts_f = points_k[1:]                           # (T, 2, K)
    val_f = valid_k[1:]                            # (T, K)

    fa = jnp.swapaxes(lam_f, 1, 2)                 # (T, K, 2)
    fb = (
        jnp.einsum("tak,tak->tk", lam_f, pts_f)
        + jnp.einsum("tek,e->tk", mu_f, h[:, 0])
    )                                              # (T, K)

    # replicate row 0 into invalid slots (sorted => valid slots come
    # first).  where-select, not take_along_axis: the equivalent gather
    # lowered to a ~1.8 ms scalar-loop fusion at B=512 (round-5 profile)
    fa = jnp.where(val_f[:, :, None], fa, fa[:, 0:1, :])
    fb = jnp.where(val_f, fb, fb[:, 0:1])

    fa = jnp.where(has_points, fa, 0.0)
    fb = jnp.where(has_points, fb, 0.0)
    return fa, fb
