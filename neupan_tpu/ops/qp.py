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
import functools
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
    # Contract-qualified default.  Round 2 pinned 300 iterations because
    # closed-loop outcomes were chaotic in the solver budget; round 3
    # removed the chaos at its root (NRMPSpec.reg_u/reg_d strict convexity
    # + the convergent active-set polish, see BASELINE.md "Round 3"), after
    # which the corridor episode takes the same route at 100/150/300/600
    # iterations and the ADMM's only job is seeding the polish.
    #
    # CANONICAL round-5 qualification record for the shipped default
    # (iters=240, condense_admm=True, box-elim polish_rounds=5,
    # refine_steps=7, admm_warm_iters=120, NRMPSpec reg_u=1e-3
    # reg_d=1e-2 — the budget the fused kernels made affordable, spent on
    # closing the reg-induced action gap, BASELINE.md "Round 5"):
    #   contract  obj gap max 1.6e-7, hard viol max 4.1e-5, |du0| max
    #             5.7e-3 vs the f64 oracle
    #   reference-formulation gap  |u0 - u0_ref-form| p50 2.3e-4 /
    #             p90 4.8e-3 / max 1.04e-2 (== the pure formulation
    #             shift; BENCH_FORMULATION_GAP.json)
    #   sweep     26/26 arrive (incl. corridor_long T=30), contact gate
    #             PASS (sweep_results.json)
    # Round-5 ladder: reg_u=reg_d=1e-3 PASSes the corridor gates but
    # stalls polygon_robot/diff and corridor_long/diff closed-loop (the
    # d/omega flat directions need reg_d ~ 1e-2); reg 3e-3 at the OLD
    # 120-iteration budget FAILs the contract outright (viol 2.2e-2).
    # Round-4 record at the old defaults (iters=120, rounds=3, refine=5,
    # warm=60, reg=0.1): contract obj gap max 1.9e-5, viol max 8.9e-5,
    # 25/25 sweep — but |u0 - u0_ref-form| max 0.246.
    iters: int = 240
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
    # scales); 3 left ~1e-3 beta-penalty error on hinge-active instances;
    # 7 = the round-5 default qualified with the small-reg configuration.
    refine_steps: int = 7
    eps_act: float = 1e-5  # dual magnitude that marks a constraint active
    # total polish rounds (EQP solves): round 0 guesses the active set from
    # the ADMM duals+values; rounds 1.. re-identify BY VALUE around the best
    # point tried with a shrinking tolerance (see _polish).  5 rounds is
    # the round-5 qualified default — see the canonical record on `iters`.
    polish_rounds: int = 5
    # Ruiz equilibration sweeps before the ADMM phases.  10 = the OSQP
    # default.  5 measured library-equivalent (kkt p90 4.3e-3 both) but
    # FAILED the closed-loop contract (one corridor step at viol 2e-2 vs
    # 3e-4) — the recorded library under-covers the scaling-sensitive
    # instances, so the knob stays at 10.
    ruiz_iters: int = 10
    # Equality-elimination (condensed) EQP path.  When set (and the caller
    # passes the elimination basis via solve_qp's `elim`), the problem's
    # rows MUST be laid out as [0, elim_n_eq) equality rows,
    # [elim_n_eq, elim_n_eq + elim_n_hard) hard inequality rows, and soft
    # rows after — the NRMP layout (ops/nrmp.py:_static_template).  The
    # always-active equalities are then eliminated analytically once per
    # QP instead of being refactored into every polish candidate's Schur
    # complement: per-candidate factorizations shrink from (n, n) + (m, m)
    # to (n - n_eq)^2 + n_hard^2 — 63^3 + 114^3 -> 30^3 + 48^3 at T=10,
    # ~14x fewer factorization flops, the dominant polish cost on TPU.
    elim_n_eq: Optional[int] = None
    elim_n_hard: Optional[int] = None
    # Bound-row structure of the hard block (round 4).  The FIRST
    # elim_n_acc hard rows are general (the NRMP acceleration rows,
    # coupling two variables); every hard row AFTER them must be a unit
    # bound on reduced coordinate i, in coordinate order (the NRMP speed
    # and d-box rows are exactly the w = (u, d) coordinates).  The polish
    # then eliminates bound-active VARIABLES directly (a masked identity
    # row/col in the reduced Hessian) and runs the dual Schur complement
    # over the acceleration rows only: (48, 48) -> (18, 18) at T=10, which
    # drops every polish factorization under the GJ threshold — the QP
    # forward pass becomes cholesky-free.  None = generic dual-Schur over
    # all hard rows (the pre-round-4 path).
    elim_n_acc: Optional[int] = None
    # Run the ADMM ITSELF in the equality-eliminated space (round 4).  The
    # dynamics/init equalities are always active, so with x = Z w + xp the
    # reduced problem has k = n - n_eq variables and m - n_eq rows; the
    # per-phase normal-matrix factorization shrinks (63->30 at T=10) and
    # the scan-body constraint operator shrinks (163x63 -> 148x30).  On
    # TPU the XLA cholesky costs ~linear in n (sequential column loop:
    # 4.0/1.8 ms at n=63/30, B=512 — BASELINE.md round 4), so this halves
    # the dominant ADMM factorization cost and ~4x-es the scan bandwidth.
    # Equalities are satisfied EXACTLY by construction (the full-space
    # path only enforces them at rho_eq_scale); equality duals are
    # recovered from stationarity through the equality Gram after the
    # solve.  Requires `elim` + the row-layout statics above.
    condense_admm: bool = True
    # Normal-matrix inverse strategy for the FULL-SPACE ADMM phases
    # ("auto" = Jacobi+GJ/cholesky _spd_inverse).  "banded" uses the
    # block-tridiagonal factorization (ops/banded.py) under the horizon-
    # interleaved permutation — the ECOS-sparse-KKT analogue for long
    # horizons (reference blocks/nrmp.py:144).  Only consulted when
    # condense_admm is off or no elimination basis is supplied: the
    # condensed normal matrix Z'PZ is dense, not banded.  banded_perm /
    # banded_block carry the (static) permutation; pan._admm_with_elim
    # fills them from the NRMP layout.
    inverse: str = "auto"
    banded_perm: Optional[Tuple[int, ...]] = None
    banded_block: int = 6
    # Retired knobs (Newton-Schulz / LU inverses, per-row soft rho, the
    # structured scan matvec, the CG Schur solve, the penalty-form EQP):
    # every one lost a measured bake-off — though NOTE (round 4,
    # docs/AXON_DISPATCH.md) those bake-offs used wall timings now known
    # to be dispatch-polluted; the history lives in docs/SOLVER_NOTES.md
    # and any revival must re-measure with scripts/prof_util.py.


# Size threshold for the unrolled Gauss-Jordan inverse.  Measured on the
# real chip (profiler device time, B=512 — BASELINE.md round 4): GJ beats
# the cholesky path 2.1x at n=30 and 1.2x at n=33 but loses at n=48
# (0.72x) and n=63 (0.34x) — XLA's cholesky/triangular custom-calls cost
# ~linear in n (sequential column loop with a large per-column constant)
# while GJ's unrolled rank-1 updates cost ~n * n^2 elementwise work, so
# the crossover sits between 33 and 48.  GJ is also markedly MORE accurate
# on the real rho_eq-stiffened NRMP matrices (||MX-I||_inf 9e-5 vs 5e-2).
_GJ_MAX_N = 36

# Batched-TPU sweep-kernel threshold (ops/pallas/sweep.py): the fused
# elimination stays profitable well past the XLA-GJ crossover because it
# pays ONE kernel launch instead of ~6n — at n=90 (the T=30 condensed
# normal matrix) it replaces the batched cholesky+triangular custom-calls
# whose cost is ~linear in n with a large per-column constant.  96 keeps
# the (n, n, 128) slab + temporaries comfortably inside VMEM.
_SWEEP_MAX_N = 96


def _spd_inverse(M: jnp.ndarray, cfg: "ADMMConfig") -> jnp.ndarray:
    """Inverse of an SPD matrix: Jacobi scaling + ridge, then either an
    unrolled Gauss-Jordan (small n; pure elementwise/rank-1 ops, no
    custom-calls — see _GJ_MAX_N) or a batched Cholesky.

    Both are SPD-native and pivot-free — constant TPU timing.  (GJ without
    pivoting is the LDL'-style elimination; on an SPD matrix every Schur
    pivot is positive, and the Jacobi scaling + 1e-7 ridge cap the
    condition.)  jnp.linalg.inv's pivoted LU measured ~100x slower on TPU
    for REAL high-condition polish Hessians (data-dependent slow path) and
    Newton-Schulz cannot converge in f32 past cond ~1e7 — both retired,
    docs/SOLVER_NOTES.md.  Residual inverse error is removed geometrically
    by the polish refinement.
    """
    n = M.shape[-1]
    dj = jax.lax.rsqrt(jnp.abs(jnp.diagonal(M, axis1=-2, axis2=-1)) + 1e-30)
    Mt = M * dj[..., :, None] * dj[..., None, :]
    eye = jnp.eye(n, dtype=M.dtype)
    Mt = Mt + 1e-7 * eye
    if n <= _SWEEP_MAX_N:
        X = _scaled_small_inverse(Mt)
    else:
        ch = jnp.linalg.cholesky(Mt)
        X = jax.scipy.linalg.cho_solve(
            (ch, True), jnp.broadcast_to(eye, Mt.shape))
    return X * dj[..., :, None] * dj[..., None, :]


@jax.custom_batching.custom_vmap
def _scaled_small_inverse(Mt: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a scaled+ridged SPD matrix, n <= _SWEEP_MAX_N.

    Unbatched: the unrolled Gauss-Jordan for n <= _GJ_MAX_N, batched XLA
    cholesky above it.  Under vmap on TPU (the production planner path:
    every solver matrix is vmapped over the scenario batch) the whole
    elimination runs as ONE fused Pallas sweep kernel (ops/pallas/
    sweep.py) instead of ~n*6 launch-bound XLA ops — the QP forward pass
    performs ~18 such inverses per planner step and they dominated the
    round-4 profile.  Accuracy is pinned against f64 in
    tests/test_pallas.py.
    """
    if Mt.ndim > 2:
        # direct batched call (not via vmap): route through the same rule
        return _scaled_small_inverse_batched(Mt)
    return _scaled_small_inverse_xla(Mt)


def _scaled_small_inverse_xla(Mt: jnp.ndarray) -> jnp.ndarray:
    n = Mt.shape[-1]
    if n <= _GJ_MAX_N:
        return _gj_inverse_scaled(Mt)
    eye = jnp.eye(n, dtype=Mt.dtype)
    ch = jnp.linalg.cholesky(Mt)
    return jax.scipy.linalg.cho_solve(
        (ch, True), jnp.broadcast_to(eye, Mt.shape))


def _scaled_small_inverse_batched(Mt: jnp.ndarray) -> jnp.ndarray:
    B = Mt.shape[0]
    if jax.default_backend() == "tpu" and Mt.ndim == 3 and B >= 8:
        from neupan_tpu.ops.pallas.sweep import sweep_spd_inverse
        return sweep_spd_inverse(Mt)
    return _scaled_small_inverse_xla(Mt)


@_scaled_small_inverse.def_vmap
def _scaled_small_inverse_vmap(axis_size, in_batched, Mt):
    if not in_batched[0]:
        Mt = jnp.broadcast_to(Mt, (axis_size,) + Mt.shape)
    return _scaled_small_inverse_batched(Mt), True


def _gj_inverse_scaled(A: jnp.ndarray) -> jnp.ndarray:
    """In-place Jordan-exchange inverse of a (scaled, ridged) SPD matrix.

    n unrolled steps of a rank-1 update + masked row/column writes — pure
    VPU work that XLA fuses, with no cholesky/triangular custom-calls.
    """
    n = A.shape[-1]
    I = jnp.eye(n, dtype=A.dtype)
    for j in range(n):
        row_mask = I[j][:, None] > 0          # selects row j
        col_mask = I[j][None, :] > 0          # selects column j
        p = A[..., j, j][..., None, None]
        inv_p = 1.0 / p
        row_j = A[..., j:j + 1, :] * inv_p    # (..., 1, n)
        col_j = A[..., :, j:j + 1]            # (..., n, 1)
        A = A - col_j * row_j
        A = jnp.where(row_mask, row_j, A)
        A = jnp.where(col_mask, -col_j * inv_p, A)
        A = jnp.where(row_mask & col_mask, inv_p, A)
    return A


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

    # unrolled (iters is static): the tiny scan bodies are launch-bound at
    # planner batch sizes; unrolling lets XLA fuse across sweeps
    for _ in range(iters):
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
        D, E, c = D * d, E * e, c * gamma
    # a penalty 0.5*soft*neg(z - l)^2 written in scaled row coordinates
    # z_bar = E z picks up c (objective scaling) / E^2 (row scaling):
    soft = None if qp.soft is None else c * qp.soft / (E * E)
    return QPData(P, q, A, E * l, E * u, soft), D, E, c


def _admm_core(qp: QPData, cfg: ADMMConfig, x0: jnp.ndarray, y0: jnp.ndarray):
    """Run fixed-iteration ADMM for one (unbatched) QP. vmap for batches.

    The problem is Ruiz-equilibrated first (fixed rho works reliably on the
    scaled problem, as in OSQP), then two scan phases run with one
    residual-balancing rho update and re-factorization in between.  The
    scan body is dense batched matmuls by design: a structured/factored
    constraint operator measured a 1.8x end-to-end regression on the real
    chip (docs/SOLVER_NOTES.md).
    """
    qp_s, D, E, c = _ruiz_equilibrate(qp, cfg.ruiz_iters)
    P, q, A = qp_s.P_diag, qp_s.q, qp_s.A
    l, u = _clip_bounds(qp_s.l, qp_s.u)
    n = P.shape[0]
    is_eq = (u - l) < 1e-9
    soft = qp_s.soft
    is_soft = None if soft is None else soft > 0.0

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
        if cfg.inverse == "banded" and cfg.banded_perm is not None:
            from neupan_tpu.ops import banded as _banded
            import numpy as _np
            Minv = _banded.btd_spd_inverse(
                M, _np.asarray(cfg.banded_perm, _np.int32),
                cfg.banded_block)
        else:
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


def _ruiz_equilibrate_dense(H, qv, A, l, u, soft, iters: int = 10):
    """Ruiz equilibration for a DENSE quadratic term (condensed ADMM).

    Same scheme as _ruiz_equilibrate but the column norms include the
    dense H = Z' diag(P) Z, and H is scaled on both sides.
    """
    n, m = H.shape[0], A.shape[0]
    D = jnp.ones((n,), H.dtype)
    E = jnp.ones((m,), H.dtype)
    c = jnp.asarray(1.0, H.dtype)

    # unrolled (iters is static) — see _ruiz_equilibrate
    for _ in range(iters):
        col_norm = jnp.sqrt(jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(A), axis=0),
                        jnp.max(jnp.abs(H), axis=0)), 1e-8))
        row_norm = jnp.sqrt(jnp.maximum(jnp.max(jnp.abs(A), axis=1), 1e-8))
        d = 1.0 / col_norm
        e = 1.0 / row_norm
        H = H * d[:, None] * d[None, :]
        qv = qv * d
        A = A * e[:, None] * d[None, :]
        gamma = 1.0 / jnp.maximum(
            jnp.maximum(jnp.mean(jnp.abs(H)), jnp.max(jnp.abs(qv))), 1e-8)
        gamma = jnp.clip(gamma, 1e-6, 1e6)
        H = H * gamma
        qv = qv * gamma
        D, E, c = D * d, E * e, c * gamma
    soft_s = None if soft is None else c * soft / (E * E)
    return H, qv, A, E * l, E * u, soft_s, D, E, c


def _condensed_phases_single(cfg: "ADMMConfig", has_soft: bool,
                             Hs, qs, As, ls, us, soft_s, w0, y0):
    """The condensed-ADMM phase loop on the scaled problem (one scenario).

    Extracted from _admm_core_condensed so the batched planner path can
    swap in the fused Pallas implementation via custom_vmap (see
    _condensed_loop); this XLA version is the unbatched/CPU reference.
    """
    k = Hs.shape[0]
    is_eq = (us - ls) < 1e-9
    is_soft = soft_s > 0.0 if has_soft else None

    def z_prox(v, rho):
        z_hard = jnp.clip(v, ls, us)
        if not has_soft:
            return z_hard
        z_sf = jnp.where(v >= ls, v, ls + (v - ls) * rho / (rho + soft_s))
        return jnp.where(is_soft, jnp.minimum(z_sf, us), z_hard)

    def phase(w, z, y, rho, iters):
        M = Hs + cfg.sigma * jnp.eye(k, dtype=Hs.dtype) + (As.T * rho) @ As
        Minv = _spd_inverse(M, cfg)

        def body(carry, _):
            w, z, y = carry
            rhs = cfg.sigma * w - qs + As.T @ (rho * z - y)
            w_t = Minv @ rhs
            z_t = As @ w_t
            w_new = cfg.alpha * w_t + (1.0 - cfg.alpha) * w
            z_mix = cfg.alpha * z_t + (1.0 - cfg.alpha) * z
            z_new = z_prox(z_mix + y / rho, rho)
            y_new = y + rho * (z_mix - z_new)
            return (w_new, z_new, y_new), None

        (w, z, y), _ = jax.lax.scan(body, (w, z, y), None, length=iters)
        return w, z, y

    def rebalance(base_rho, w, z, y):
        Aw = As @ w
        Hw, Aty = Hs @ w, As.T @ y
        rp = jnp.max(jnp.abs(Aw - z)) / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Aw)), jnp.max(jnp.abs(z))), 1e-6)
        rd = jnp.max(jnp.abs(Hw + qs + Aty)) / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Hw)),
                        jnp.maximum(jnp.max(jnp.abs(Aty)),
                                    jnp.max(jnp.abs(qs)))), 1e-6)
        scale = jnp.clip(jnp.sqrt(rp / jnp.maximum(rd, 1e-12)), 1e-2, 1e2)
        return jnp.clip(base_rho * scale, 1e-4, 1e3)

    n_phases = max(1, int(cfg.rho_updates) + 1)
    per_phase = max(cfg.iters // n_phases, 1)
    base_rho = jnp.asarray(cfg.rho, Hs.dtype)
    z0 = jnp.clip(As @ w0, ls, us)
    w, z, y = w0, z0, y0
    for i in range(n_phases):
        rho = jnp.where(is_eq, base_rho * cfg.rho_eq_scale, base_rho)
        iters = (per_phase if i < n_phases - 1
                 else cfg.iters - per_phase * (n_phases - 1))
        w, z, y = phase(w, z, y, rho, iters)
        if i < n_phases - 1:
            base_rho = rebalance(base_rho, w, z, y)
    return w, z, y


def _condensed_phases_batched(cfg: "ADMMConfig", has_soft: bool,
                              Hs, qs, As, ls, us, soft_s, w0, y0):
    """Batched phase loop: fused Pallas iteration kernel + sweep inverse.

    Same math as _condensed_phases_single, restructured for the scenario
    batch: the normal matrix build is one batched MXU einsum, its inverse
    one sweep-kernel call (ops/pallas/sweep.py), and each phase's
    fixed-iteration loop ONE Pallas call holding w/z/y in VMEM throughout
    (ops/pallas/admm.py) — per-op scheduling of the scan body was the
    dominant residual cost of the round-4 solver (BASELINE.md round 5).
    """
    from neupan_tpu.ops.pallas.admm import admm_iterate, admm_kernel_fits

    B, m, k = As.shape
    if not (jax.default_backend() == "tpu" and B >= 8
            and admm_kernel_fits(k, m)):
        return jax.vmap(
            lambda *a: _condensed_phases_single(cfg, has_soft, *a))(
                Hs, qs, As, ls, us, soft_s, w0, y0)

    is_eq = (us - ls) < 1e-9
    eye = jnp.eye(k, dtype=Hs.dtype)

    def rebalance(base_rho, w, z, y):
        Aw = jnp.einsum("bmk,bk->bm", As, w)
        Hw = jnp.einsum("bij,bj->bi", Hs, w)
        Aty = jnp.einsum("bmk,bm->bk", As, y)
        amax = lambda v: jnp.max(jnp.abs(v), axis=-1)
        rp = amax(Aw - z) / jnp.maximum(jnp.maximum(amax(Aw), amax(z)), 1e-6)
        rd = amax(Hw + qs + Aty) / jnp.maximum(
            jnp.maximum(amax(Hw), jnp.maximum(amax(Aty), amax(qs))), 1e-6)
        scale = jnp.clip(jnp.sqrt(rp / jnp.maximum(rd, 1e-12)), 1e-2, 1e2)
        return jnp.clip(base_rho * scale, 1e-4, 1e3)

    n_phases = max(1, int(cfg.rho_updates) + 1)
    per_phase = max(cfg.iters // n_phases, 1)
    base_rho = jnp.full((B,), cfg.rho, Hs.dtype)
    z0 = jnp.clip(jnp.einsum("bmk,bk->bm", As, w0), ls, us)
    w, z, y = w0, z0, y0
    for i in range(n_phases):
        rho = jnp.where(is_eq, base_rho[:, None] * cfg.rho_eq_scale,
                        base_rho[:, None])                    # (B, m)
        M = (Hs + cfg.sigma * eye
             + jnp.einsum("bmi,bm,bmj->bij", As, rho, As))
        Minv = _spd_inverse(M, cfg)
        iters = (per_phase if i < n_phases - 1
                 else cfg.iters - per_phase * (n_phases - 1))
        w, z, y = admm_iterate(Minv, As, qs, ls, us, soft_s, rho, w, z, y,
                               iters=iters, sigma=float(cfg.sigma),
                               alpha=float(cfg.alpha), has_soft=has_soft)
        if i < n_phases - 1:
            base_rho = rebalance(base_rho, w, z, y)
    return w, z, y


@functools.lru_cache(maxsize=64)
def _condensed_loop(cfg: "ADMMConfig", has_soft: bool):
    """custom_vmap wrapper: per-scenario callers trace the XLA loop; the
    scenario-vmapped planner path dispatches to the fused batched
    implementation on TPU (ops/pallas/admm.py), XLA-vmap elsewhere."""

    @jax.custom_batching.custom_vmap
    def loop(Hs, qs, As, ls, us, soft_s, w0, y0):
        return _condensed_phases_single(cfg, has_soft, Hs, qs, As, ls, us,
                                        soft_s, w0, y0)

    @loop.def_vmap
    def _loop_vmap(axis_size, in_batched, *args):
        args = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)]
        return (_condensed_phases_batched(cfg, has_soft, *args),
                (True, True, True))

    return loop


def _admm_core_condensed(qp: QPData, cfg: ADMMConfig,
                         x0: jnp.ndarray, y0: jnp.ndarray, elim,
                         Geq_inv: jnp.ndarray):
    """ADMM on the equality-eliminated problem (see ADMMConfig.condense_admm).

    Contract with the elimination basis (ops/nrmp.py:condensation): the
    LAST k coordinates of x are exactly w (Z's bottom k x k block is the
    identity and xp vanishes there), so warm starts transfer as
    w0 = x0[-k:]; reduced duals seed from y0 with the equality rows
    dropped.  Returns full-space (x, y, z, r_prim, r_dual) with equality
    duals recovered from stationarity via the equality Gram inverse.
    """
    Z, xp = elim
    n_eq = cfg.elim_n_eq
    k = Z.shape[1]
    P, q, A = qp.P_diag, qp.q, qp.A

    # reduced problem: 0.5 w' Hr w + qr' w,  l_r <= Ar w <= u_r (+ soft)
    Ar = A[n_eq:] @ Z                                # (m_r, k)
    Axp = A[n_eq:] @ xp
    l_r, u_r = _clip_bounds(qp.l[n_eq:] - Axp, qp.u[n_eq:] - Axp)
    soft_r = None if qp.soft is None else qp.soft[n_eq:]
    PZ = Z * P[:, None]
    Hr = Z.T @ PZ
    qr = Z.T @ (q + P * xp)

    Hs, qs, As, ls, us, soft_s, D, E, c = _ruiz_equilibrate_dense(
        Hr, qr, Ar, l_r, u_r, soft_r, cfg.ruiz_iters)
    ls, us = _clip_bounds(ls, us)

    w0 = x0[-k:] / D
    y0_r = c * y0[n_eq:] / E

    has_soft = soft_s is not None
    soft_arg = soft_s if has_soft else jnp.zeros_like(ls)
    w, z, y = _condensed_loop(cfg, has_soft)(
        Hs, qs, As, ls, us, soft_arg, w0, y0_r)

    # back to full space
    w = D * w
    y_r = E * y / c
    x = Z @ w + xp
    m = A.shape[0]
    y_full = jnp.zeros((m,), P.dtype).at[n_eq:].set(y_r)
    # equality duals from stationarity: Aeq' y_eq = -(P x + q + A_r' y_r)
    r_stat = -(P * x + q + A[n_eq:].T @ y_r)
    y_eq = Geq_inv @ (A[:n_eq] @ r_stat)
    y_full = y_full.at[:n_eq].set(y_eq)

    l0, u0 = _clip_bounds(qp.l, qp.u)
    Ax = A @ x
    z_full = jnp.clip(Ax, l0, u0)
    viol = jnp.abs(Ax - z_full)
    if qp.soft is not None:
        z_full = jnp.where(qp.soft > 0.0, Ax, z_full)
        viol = jnp.where(qp.soft > 0.0, 0.0, viol)
    r_prim = jnp.max(viol)
    r_dual = jnp.max(jnp.abs(P * x + q + A.T @ y_full))
    return x, y_full, z_full, r_prim, r_dual


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
    """Solve the masked active-set EQP exactly via a dual Schur complement.

    Uses all m rows with a mask so shapes stay static.  The equality-
    constrained QP for an active-set guess is

        minimize  1/2 x' Hp x - g1' x       Hp = diag(P) + SA'SA
        subject to  DAn x = g2n             (unit-normalized active rows)

    where SA = sqrt(soft_i) a_i collects the ACTIVE soft (penalty) rows —
    their one-sided quadratic is exact once the active side is fixed — and
    g1 = -q + SA' g3 their gradient target.  Solved by the dual Schur
    complement

        S  = DAn Hp^{-1} DAn' + diag(1-d) + delta I
        yn = S^{-1} (DAn Hp^{-1} g1 - g2n),   x = Hp^{-1}(g1 - DAn' yn)

    which yields the exact multipliers BY CONSTRUCTION — the round-2
    penalty formulation (beta-weighted normal matrix + difference-quotient
    duals) broke down in f32 whenever many soft rows were active: its
    beta ~ 1e2 * total soft curvature reached ~1e6, and both the primal
    (cancellation in H) and the duals (beta times f32 residuals) drowned.
    Here the only conditioning is Hp's (Jacobi-scaled Cholesky) and the
    active-set geometry in S (unit rows; the diag(1-d) block decouples
    inactive rows, the 1e-6 delta picks min-norm multipliers when active
    rows are linearly dependent).  A few rounds of iterative refinement
    against the exact KKT operator clear the remaining f32 factorization
    noise.  Returns (x_pol, y_pol, finite_ok).
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
    rn = jnp.sqrt(jnp.sum(DA * DA, axis=1))
    rs = jnp.where(active, 1.0 / jnp.maximum(rn, 1e-8), 0.0)
    DAn = DA * rs[:, None]
    g2n = b_act * rs

    if soft_act is None:
        SA = None
        g1 = -q

        def soft_grad(x):
            return jnp.zeros_like(x)
    else:
        ssd = jnp.sqrt(qp.soft * soft_act.astype(P.dtype))
        SA = A * ssd[:, None]
        g3 = ssd * l
        SAtg3 = SA.T @ g3
        g1 = -q + SAtg3

        def soft_grad(x):
            return SA.T @ (SA @ x) - SAtg3

    Hp = jnp.diag(P + cfg.sigma)
    if SA is not None:
        Hp = Hp + SA.T @ SA
    Hp_inv = _spd_inverse(Hp, cfg)

    HDAt = Hp_inv @ DAn.T                        # (n, m)

    S = DAn @ HDAt + jnp.diag((1.0 - d) + 1e-6)  # (m, m) SPD
    S_inv = _spd_inverse(S, cfg)

    def S_solve(b):
        return S_inv @ b

    def kkt_solve(r1, r2n):
        """Exact solve of  Hp dx + DAn' dyn = r1 ; DAn dx + (1-d) dyn = r2n."""
        dyn = S_solve(HDAt.T @ r1 - r2n)
        dx = Hp_inv @ (r1 - DAn.T @ dyn)
        return dx, dyn

    x, yn = kkt_solve(g1, g2n)

    # iterative refinement against the exact KKT operator (true P, no
    # sigma) clears the f32 factorization/cancellation noise geometrically
    for _ in range(cfg.refine_steps):
        r1 = -q - P * x - soft_grad(x) - DAn.T @ (d * yn)
        r2n = g2n - (DAn @ x + (1.0 - d) * yn)
        dx, dyn = kkt_solve(r1, r2n)
        x = x + dx
        yn = yn + dyn

    y = d * yn * rs
    if is_soft is not None:
        # duals of soft rows are the (true, piecewise) penalty gradient
        y = jnp.where(is_soft, qp.soft * jnp.minimum(A @ x - l, 0.0), y)

    ok = jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(y))
    return x, y, ok


def _polish_candidate_condensed(qp: QPData, cfg: ADMMConfig, low_act, up_act,
                                soft_act, Z, xp, Geq_inv):
    """Condensed active-set EQP: equalities eliminated via x = Z w + xp.

    See ADMMConfig.elim_n_eq for the row-layout contract and the cost
    argument.  The reduced problem over w is

        minimize  1/2 w' Hr w - g1r' w        Hr = Z' Hp Z
        subject to  DAr w = g2r               (active hard-ineq rows)

    solved by the same dual-Schur scheme as the full-space candidate, but
    with (k, k) and (n_hard, n_hard) factorizations.  Equality duals are
    recovered afterward from stationarity through the equality Gram
    (Geq_inv, computed once per QP in _polish).
    """
    P, q, A = qp.P_diag, qp.q, qp.A
    l, u = _clip_bounds(qp.l, qp.u)
    n_eq, n_hard = cfg.elim_n_eq, cfg.elim_n_hard
    sl = slice(n_eq, n_eq + n_hard)

    A_h = A[sl]
    l_h, u_h = l[sl], u[sl]
    act_h = (low_act[sl] | up_act[sl])
    d = act_h.astype(P.dtype)
    b_act = jnp.where(up_act[sl], u_h, l_h)
    b_act = jnp.where(act_h, b_act, 0.0)

    DAh = A_h * d[:, None]
    rn = jnp.sqrt(jnp.sum(DAh * DAh, axis=1))
    rs = jnp.where(act_h, 1.0 / jnp.maximum(rn, 1e-8), 0.0)
    DAnh = DAh * rs[:, None]

    if soft_act is None:
        SA = None
        g1 = -q

        def soft_grad(x_):
            return jnp.zeros_like(x_)
    else:
        ssd = jnp.sqrt(qp.soft * soft_act.astype(P.dtype))
        SA = A * ssd[:, None]
        g3 = ssd * l
        SAtg3 = SA.T @ g3
        g1 = -q + SAtg3

        def soft_grad(x_):
            return SA.T @ (SA @ x_) - SAtg3

    Pr = P + cfg.sigma

    def Hp_mv(v):
        out = Pr * v
        if SA is not None:
            out = out + SA.T @ (SA @ v)
        return out

    # reduced quantities
    PZ = Z * Pr[:, None]
    Hr = Z.T @ PZ
    if SA is not None:
        SZ = SA @ Z
        Hr = Hr + SZ.T @ SZ
    g1r = Z.T @ (g1 - Hp_mv(xp))
    DAr = DAnh @ Z                                   # (n_hard, k)
    g2r = b_act * rs - DAnh @ xp                     # normalized rhs

    Hr_inv = _spd_inverse(Hr, cfg)
    HDAt = Hr_inv @ DAr.T                            # (k, n_hard)
    S = DAr @ HDAt + jnp.diag((1.0 - d) + 1e-6)      # (n_hard, n_hard)
    S_inv = _spd_inverse(S, cfg)

    def kkt_solve(r1, r2):
        dyn = S_inv @ (HDAt.T @ r1 - r2)
        dw = Hr_inv @ (r1 - DAr.T @ dyn)
        return dw, dyn

    w, yn = kkt_solve(g1r, g2r)

    for _ in range(cfg.refine_steps):
        x_full = Z @ w + xp
        r1 = Z.T @ (-q - P * x_full - soft_grad(x_full)) - DAr.T @ (d * yn)
        r2 = g2r - (DAr @ w + (1.0 - d) * yn)
        dw, dyn = kkt_solve(r1, r2)
        w = w + dw
        yn = yn + dyn

    x = Z @ w + xp
    y_h = d * yn * rs

    # full dual vector: hard-ineq slice + soft gradient + equality recovery
    m = A.shape[0]
    y = jnp.zeros((m,), P.dtype).at[sl].set(y_h)
    if soft_act is not None:
        is_soft = qp.soft > 0.0
        y = jnp.where(is_soft, qp.soft * jnp.minimum(A @ x - l, 0.0), y)
    r_stat = -q - P * x - soft_grad(x) - A_h.T @ y_h
    y_eq = Geq_inv @ (A[:n_eq] @ r_stat)
    y = y.at[:n_eq].set(y_eq)

    ok = jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(y))
    return x, y, ok


def _box_candidate_single(refine: int, Hr, Hr_ref, DAn, C0, g1r, g2n,
                          b_box, fix, d):
    """XLA reference for the box-elim candidate solve (one scenario).

    Pinned-coordinate KKT: masked Hessian Hm (identity row/col at pinned
    coordinates), dual Schur over the normalized acc rows, then
    ``refine`` reduced-space refinement passes (grad = C0 - Hr_ref w).
    The batched TPU path runs the identical math as ONE fused Pallas
    kernel (ops/pallas/polish.py) — at B=512 this chain is ~80
    launch-bound ops per candidate x 10 candidates per planner step.
    """
    free = 1.0 - fix
    Hm = Hr * free[:, None] * free[None, :] + jnp.diag(fix)
    Hm_inv = _spd_inverse(Hm, None)
    HD = Hm_inv @ DAn.T
    S = DAn @ HD + jnp.diag((1.0 - d) + 1e-6)
    S_inv = _spd_inverse(S, None)

    def kkt_solve(r1, r_fix, r2n):
        t = free * (r1 - Hr @ (fix * r_fix)) + fix * r_fix
        dw0 = Hm_inv @ t
        dyn = S_inv @ (DAn @ dw0 - r2n)
        dw = dw0 - Hm_inv @ (free * (DAn.T @ dyn))
        return dw, dyn

    w, yn = kkt_solve(g1r, b_box, g2n)
    for _ in range(refine):
        grad_r = C0 - Hr_ref @ w
        r1 = grad_r - DAn.T @ (d * yn)
        r_fix = b_box - w
        r2n = g2n - (DAn @ w + (1.0 - d) * yn)
        dw, dyn = kkt_solve(r1, fix * r_fix, r2n)
        w = w + dw
        yn = yn + dyn
    return w, yn


@functools.lru_cache(maxsize=16)
def _box_candidate_loop(refine: int):
    """custom_vmap wrapper for the box-elim candidate solve."""

    @jax.custom_batching.custom_vmap
    def loop(Hr, Hr_ref, DAn, C0, g1r, g2n, b_box, fix, d):
        return _box_candidate_single(refine, Hr, Hr_ref, DAn, C0, g1r,
                                     g2n, b_box, fix, d)

    @loop.def_vmap
    def _loop_vmap(axis_size, in_batched, *args):
        args = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)]
        B = args[0].shape[0]
        if jax.default_backend() == "tpu" and B >= 8:
            from neupan_tpu.ops.pallas.polish import box_candidate
            w, yn = box_candidate(*args, refine=refine)
        else:
            w, yn = jax.vmap(
                lambda *a: _box_candidate_single(refine, *a))(*args)
        return (w, yn), (True, True)

    return loop


def _polish_candidate_condensed_box(qp: QPData, cfg: ADMMConfig, low_act,
                                    up_act, soft_act, Z, xp, Geq_inv):
    """Condensed EQP with bound-active VARIABLES eliminated directly.

    Requires cfg.elim_n_acc (see ADMMConfig): hard rows split into
    [general acc rows | unit bound rows in w-coordinate order].  An active
    bound row pins w_i = b_i; instead of carrying it as a Schur row, the
    reduced Hessian gets an identity row/col at i (Hm below) and only the
    ACC rows enter the dual Schur complement — (n_acc, n_acc) instead of
    (n_hard, n_hard).  Bound-row duals are recovered from stationarity at
    the pinned coordinates, equality duals through Geq_inv as before.
    """
    P, q, A = qp.P_diag, qp.q, qp.A
    l, u = _clip_bounds(qp.l, qp.u)
    n_eq, n_acc = cfg.elim_n_eq, cfg.elim_n_acc
    k = Z.shape[1]
    sl_acc = slice(n_eq, n_eq + n_acc)
    sl_box = slice(n_eq + n_acc, n_eq + cfg.elim_n_hard)

    # ---- bound rows -> pinned coordinates --------------------------------
    lo_b, up_b = low_act[sl_box], up_act[sl_box]
    act_box = lo_b | up_b                              # (k,)
    b_box = jnp.where(up_b, u[sl_box], l[sl_box])
    b_box = jnp.where(act_box, b_box, 0.0)
    fix = act_box.astype(P.dtype)
    free = 1.0 - fix

    # ---- objective pieces (identical to the generic condensed path) -----
    if soft_act is None:
        SA = None
        g1 = -q

        def soft_grad(x_):
            return jnp.zeros_like(x_)
    else:
        ssd = jnp.sqrt(qp.soft * soft_act.astype(P.dtype))
        SA = A * ssd[:, None]
        g3 = ssd * l
        SAtg3 = SA.T @ g3
        g1 = -q + SAtg3

        def soft_grad(x_):
            return SA.T @ (SA @ x_) - SAtg3

    Pr = P + cfg.sigma

    def Hp_mv(v):
        out = Pr * v
        if SA is not None:
            out = out + SA.T @ (SA @ v)
        return out

    PZ = Z * Pr[:, None]
    Hr = Z.T @ PZ
    if SA is not None:
        SZ = SA @ Z
        Hr = Hr + SZ.T @ SZ
    g1r = Z.T @ (g1 - Hp_mv(xp))

    # ---- acc rows: dual Schur over the general rows only -----------------
    A_acc = A[sl_acc] @ Z                              # (n_acc, k)
    act_acc = (low_act[sl_acc] | up_act[sl_acc])
    b_acc = jnp.where(up_act[sl_acc], u[sl_acc], l[sl_acc])
    A_acc_f = A_acc * free[None, :]                    # pinned cols to rhs
    rn = jnp.sqrt(jnp.sum(A_acc_f * A_acc_f, axis=1))
    # an active acc row whose variables are ALL pinned is redundant (or
    # infeasible-by-1e-x); drop it rather than dividing by ~0
    act_acc = act_acc & (rn > 1e-6)
    d = act_acc.astype(P.dtype)
    rs = jnp.where(act_acc, 1.0 / jnp.maximum(rn, 1e-8), 0.0)
    DAn = (A_acc_f * d[:, None]) * rs[:, None]         # (n_acc, k) normalized
    # rhs: full-space row value minus xp and pinned-coordinate parts
    b_eff = b_acc - A[sl_acc] @ xp - A_acc @ (fix * b_box)
    g2n = jnp.where(act_acc, b_eff * rs, 0.0)

    # Reduced-space refinement operator.  The reduced gradient collapses
    # algebraically — with x = Z w + xp,
    #   Z'(-q - P x - soft_grad(x)) = C0 - Hr_ref w,
    #   C0 = Z'(-q - P xp + SAtg3 - SA'(SA xp)),  Hr_ref = Z'PZ + SZ'SZ
    # (the TRUE Hessian, no sigma), so each refine step is ONE (k, k)
    # matvec instead of four full-space products.
    Hr_ref = Z.T @ (Z * P[:, None])
    if SA is not None:
        Hr_ref = Hr_ref + SZ.T @ SZ
        C0 = Z.T @ (-q - P * xp + SAtg3) - SZ.T @ (SA @ xp)
    else:
        C0 = Z.T @ (-q - P * xp)

    # the whole candidate solve (masked-Hessian + Schur inverses, KKT
    # solve, refinement) dispatches to one fused Pallas kernel on the
    # batched TPU path (ops/pallas/polish.py) via custom_vmap
    w, yn = _box_candidate_loop(int(cfg.refine_steps))(
        Hr, Hr_ref, DAn, C0, g1r, g2n, b_box, fix, d)

    x = Z @ w + xp
    y_acc = d * yn * rs

    # ---- dual recovery ----------------------------------------------------
    # bound rows: stationarity residual at the pinned coordinates
    grad_r = C0 - Hr_ref @ w
    y_box = fix * (grad_r - A_acc.T @ y_acc)
    m = A.shape[0]
    y = jnp.zeros((m,), P.dtype)
    y = y.at[sl_acc].set(y_acc)
    y = y.at[sl_box].set(y_box)
    if soft_act is not None:
        is_soft = qp.soft > 0.0
        y = jnp.where(is_soft, qp.soft * jnp.minimum(A @ x - l, 0.0), y)
    r_stat = -q - P * x - soft_grad(x) - A[n_eq:].T @ y[n_eq:]
    y_eq = Geq_inv @ (A[:n_eq] @ r_stat)
    y = y.at[:n_eq].set(y_eq)

    ok = jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(y))
    return x, y, ok


def _polish(qp: QPData, cfg: ADMMConfig, x: jnp.ndarray, y: jnp.ndarray,
            elim=None, Geq_inv=None):
    """Iterated active-set polish with value-based identification.

    Round-3 redesign, grounded in the recorded corridor instance library
    (scripts/exp_solver_lab.py):

    * ADMM duals are far too noisy to identify the active set (eps_act
      marks ~35-70 EXTRA rows on hinge-active instances while the true set
      is contained in the guess), and the old add/drop re-guessing rules
      read those same duals, so extra rows were never dropped (the
      recovered least-squares multipliers spread stationarity over them
      with consistent signs) — the loop cycled without converging.
    * Value-based identification is reliable because the ADMM PRIMAL
      converges well (hard feasibility ~1e-5 while the dual error is
      ~1e-1): a row is active iff its value sits within tol of a bound,
      with tol SHRINKING each round as the solve sharpens — extra rows
      captured this way are near-harmless (they are enforced at values the
      point already has), and missing rows are caught the next round once
      x moves.  Soft (penalty) rows are active iff strictly on the penalty
      side.  This requires a strictly convex P (NRMPSpec.reg_u/reg_d): an
      EQP from a wrong guess is then bounded, so a bad round degrades
      gracefully instead of diverging.

    The update rule per round, anchored on the BEST point (x_g, y_g) tried
    so far:

        set_side = value-near-or-violated at x_g  &  NOT wrong-sign at y_g

    The wrong-sign veto must act in the SAME round as the value
    identification: a wrongly enforced row still sits exactly at its bound
    at the candidate that enforced it, so naive value re-identification
    re-adds it forever — this one interaction was the round-2 polish
    stall (library instances 83/84/63/64 sat at a self-reproducing set
    with one extra row whose multiplier had the wrong sign; with the veto,
    the f64 version of this iteration converges every library instance to
    the oracle, KKT ~1e-10).  Anchoring on the BEST point — rather than
    iterating from the newest candidate — keeps the deep-contact
    instances stable (40+ soft rows chatter around their kinks when the
    identification follows a wandering candidate; anchored identification
    leaves them at the ADMM iterate, which is the right fallback there).
    The veto threshold scales with the anchor's own KKT error: exact EQP
    duals support a tight veto, noisy ADMM duals only a loose one.
    """
    P, q, A = qp.P_diag, qp.q, qp.A
    l, u = _clip_bounds(qp.l, qp.u)
    is_eq = (u - l) < 1e-9
    is_soft = None if qp.soft is None else qp.soft > 0.0
    row_norm = jnp.sqrt(jnp.sum(A * A, axis=1))
    tol_scale = jnp.maximum(row_norm, 1.0)

    big = jnp.asarray(jnp.inf, P.dtype)
    def hard_viol(Axc):
        v = jnp.abs(Axc - jnp.clip(Axc, l, u))
        if qp.soft is not None:
            v = jnp.where(is_soft, 0.0, v)
        return jnp.max(v)

    def rank_error(Axc, e_kkt):
        """Selection metric: KKT error with hard violations up-weighted.

        Feasibility is a hard contract bound while stationarity tolerance
        is looser; ranked by the plain KKT error, an infeasible candidate
        (viol 3e-3 = its whole KKT error) beat a feasible one at
        stationarity 4e-3 — exactly the wrong trade (round-3 contract
        step 25).  The 5x weight makes feasibility dominate near-ties.
        """
        return jnp.maximum(e_kkt, 5.0 * hard_viol(Axc))

    Ax = A @ x
    e0 = rank_error(Ax, kkt_error(P, q, A, l, u, x, y, qp.soft))
    tol0 = jnp.clip(10.0 * hard_viol(Ax), 1e-5, 1e-2)

    def identify(Axc, tol):
        """Value-based activation at accuracy `tol` (+ violated side)."""
        lo = (jnp.abs(Axc - l) < tol) | (Axc < l)
        hi = (jnp.abs(Axc - u) < tol) | (Axc > u)
        if qp.soft is None:
            sa = None
        else:
            sa = is_soft & (Axc - l < 0.0)
            lo, hi = lo & ~is_soft, hi & ~is_soft
        return lo & ~is_eq, hi & ~is_eq, sa

    use_elim = (elim is not None and cfg.elim_n_eq is not None
                and cfg.elim_n_hard is not None)
    if use_elim:
        Z_e, xp_e = elim
        if Geq_inv is None:
            Aeq = A[: cfg.elim_n_eq]
            Geq = Aeq @ Aeq.T + 1e-8 * jnp.eye(cfg.elim_n_eq, dtype=P.dtype)
            Geq_inv = _spd_inverse(Geq, cfg)

        if cfg.elim_n_acc is not None:
            def candidate(lo, hi, sa):
                return _polish_candidate_condensed_box(qp, cfg, lo, hi, sa,
                                                       Z_e, xp_e, Geq_inv)
        else:
            def candidate(lo, hi, sa):
                return _polish_candidate_condensed(qp, cfg, lo, hi, sa,
                                                   Z_e, xp_e, Geq_inv)
    else:
        def candidate(lo, hi, sa):
            return _polish_candidate(qp, cfg, lo, hi, sa)

    x_g, y_g, e_g = x, y, e0            # best point tried (anchor)
    x_out, y_out, e_out = x, y, e0
    polished = jnp.asarray(False)
    margin = 0.3

    # identification tolerances per round: round 0 at the ADMM iterate's
    # achieved accuracy, then geometrically shrinking as the anchor
    # sharpens — the tolerance must stay ABOVE the anchor's own primal
    # error or truly-active rows fall out of the set (their residual at
    # the anchor exceeds the tolerance), which under-constrains the EQP
    # and sends the candidate wandering; the floor 3e-4 sits just above
    # the f32 EQP solve accuracy.  Extra near-bound rows captured by a
    # looser tol are enforced at values the anchor already has (harmless).
    n_rounds = max(int(cfg.polish_rounds), 1)
    tols = [None] + [max(3e-3 * (0.3 ** (r - 1)), 3e-4)
                     for r in range(1, n_rounds)]

    for r in range(n_rounds):
        Axg = A @ x_g
        tol_r = tol0 if r == 0 else tols[r]
        vlow, vup, sact_g = identify(Axg, tol_r * tol_scale)
        if r == 0:
            # seed round additionally trusts the ADMM DUAL signs (the
            # classic OSQP guess).  The dual-marked extras are individually
            # noise, but measured on the library they encode which rows
            # push at mediocre ADMM points — value-only seeding loses
            # 100-150-iteration anchors badly (u0 budget-sensitivity
            # 0.05 -> 0.3) while the dual-seeded first candidate recovers.
            dlow = (y < -cfg.eps_act) & ~is_eq
            dup = (y > cfg.eps_act) & ~is_eq
            if qp.soft is not None:
                dlow, dup = dlow & ~is_soft, dup & ~is_soft
            vlow = vlow | dlow
            vup = vup | dup
        # wrong-sign veto from the anchor's duals.  Threshold: tight when
        # the anchor is an exact EQP candidate (dual noise ~2e-4), loose
        # when it is still the raw ADMM iterate (dual noise ~ its KKT
        # error) — a genuinely active row with a multiplier below the
        # threshold is weakly active and harmless either way.
        eps_drop = jnp.maximum(1e-3, 0.3 * e_g)
        low_g = vlow & ~(y_g > eps_drop)
        up_g = vup & ~(y_g < -eps_drop)
        xc, yc, okc = candidate(low_g, up_g, sact_g)
        Axc = A @ xc
        ec = jnp.where(
            okc,
            rank_error(Axc, kkt_error(P, q, A, l, u, xc, yc, qp.soft)),
            big)
        # output acceptance: tight margin near the accuracy floor (near-
        # equal errors ~1e-3 can flap between compile paths); well above
        # it any clear improvement ships — rejecting those was measured to
        # leave raw ADMM iterates with 3e-3 hard violations as output
        usec = (ec <= margin * e_out) | ((ec <= 0.7 * e_out) & (e_out > 3e-2))
        x_out = jnp.where(usec, xc, x_out)
        y_out = jnp.where(usec, yc, y_out)
        e_out = jnp.where(usec, ec, e_out)
        polished = polished | usec
        # anchor: plain argmin over points tried
        gc = ec < e_g
        x_g = jnp.where(gc, xc, x_g)
        y_g = jnp.where(gc, yc, y_g)
        e_g = jnp.where(gc, ec, e_g)

    return x_out, y_out, None, None, polished


def _snap_variable_bounds(qp: QPData, x: jnp.ndarray) -> jnp.ndarray:
    """Project x onto the single-variable (box) hard rows exactly.

    Rows of A with exactly one nonzero entry are plain variable bounds; an
    epsilon-violation left by the f32 polish (the last library stragglers
    were a speed row at 1.2e-3 and a d-box row at 2.9e-3) is removed at
    machine precision by clipping the variable.  The induced perturbation
    of coupled rows (e.g. dynamics equalities touching a clipped control)
    is |A|*delta ~ 1e-4, well inside the feasibility contract.
    """
    A, l, u = qp.A, qp.l, qp.u
    m = A.shape[0]
    absA = jnp.abs(A)
    nz = absA > 1e-12                                # (m, n)
    nnz = jnp.sum(nz, axis=1)
    hard = jnp.ones((m,), bool) if qp.soft is None else ~(qp.soft > 0.0)
    is_box = (nnz == 1) & hard & (u - l >= 1e-9)  # skip eq rows (dynamics)
    # the single nonzero coefficient of each box row (mask-sum, not gather:
    # a row-gather A[arange(m), argmax] lowered to a ~1 ms scalar-loop
    # custom fusion at B=512 — the round-5 profile's single largest op)
    a = jnp.sum(jnp.where(nz, A, 0.0), axis=1)
    safe_a = jnp.where(jnp.abs(a) > 1e-12, a, 1.0)
    lo = jnp.where(a > 0, l, u) / safe_a
    hi = jnp.where(a > 0, u, l) / safe_a
    lo, hi = jnp.maximum(lo, -_BIG), jnp.minimum(hi, _BIG)
    # per-variable bounds by masked reduction over rows (order-independent,
    # several box rows may bound the same variable)
    sel = nz & is_box[:, None]                       # (m, n)
    lo_var = jnp.max(jnp.where(sel, lo[:, None], -_BIG), axis=0)
    hi_var = jnp.min(jnp.where(sel, hi[:, None], _BIG), axis=0)
    return jnp.clip(x, lo_var, hi_var)


def _solve_single(qp: QPData, cfg: ADMMConfig,
                  x0: jnp.ndarray, y0: jnp.ndarray,
                  elim=None) -> QPSolution:
    # The solver's accuracy contract (<= 1e-3 control error vs the reference
    # solver) requires exact f32 matmuls: block bf16 fast paths (TPU MXU
    # default, CPU AMX) for everything inside the solve.
    with jax.default_matmul_precision("highest"):
        use_elim = (elim is not None and cfg.elim_n_eq is not None
                    and cfg.elim_n_hard is not None)
        Geq_inv = None
        if use_elim:
            # equality Gram inverse, shared by the condensed ADMM's dual
            # recovery and every polish round's dual recovery
            Aeq = qp.A[: cfg.elim_n_eq]
            Geq = Aeq @ Aeq.T + 1e-8 * jnp.eye(cfg.elim_n_eq,
                                               dtype=qp.P_diag.dtype)
            Geq_inv = _spd_inverse(Geq, cfg)
        if use_elim and cfg.condense_admm:
            x, y, z, rp, rd = _admm_core_condensed(qp, cfg, x0, y0, elim,
                                                   Geq_inv)
        else:
            x, y, z, rp, rd = _admm_core(qp, cfg, x0, y0)
        if cfg.polish:
            x, y, _, _, _ = _polish(qp, cfg, x, y, elim, Geq_inv=Geq_inv)
            x = _snap_variable_bounds(qp, x)
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
             elim=None) -> QPSolution:
    """Solve one QP (unbatched).  Differentiable w.r.t. qp fields.

    ``elim`` = (Z, xp) optionally provides the equality-elimination basis
    for the condensed polish path (requires cfg.elim_n_eq/elim_n_hard; see
    ADMMConfig and ops/nrmp.py:condensation).  Gradients always flow
    through the dense qp fields (the basis duplicates information already
    inside qp, so it carries zero cotangent).

    For batches, vmap this function (see ``solve_qp_batch``).
    """
    n, m = qp.P_diag.shape[0], qp.A.shape[0]
    if x0 is None:
        x0 = jnp.zeros((n,), dtype=qp.P_diag.dtype)
    if y0 is None:
        y0 = jnp.zeros((m,), dtype=qp.P_diag.dtype)
    return _solve_qp_vjp(qp, cfg, x0, y0, elim)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _solve_qp_vjp(qp: QPData, cfg: ADMMConfig,
                  x0: jnp.ndarray, y0: jnp.ndarray, elim) -> QPSolution:
    return _solve_single(qp, cfg, x0, y0, elim)


def _solve_fwd(qp, cfg, x0, y0, elim):
    sol = _solve_single(qp, cfg, x0, y0, elim)
    return sol, (qp, sol.x, sol.y, elim)


def _solve_bwd(cfg, res, g):
    """Implicit differentiation through the active-set KKT conditions.

    At the solution: P x + q + A' y = 0 and, for active rows, A_i x = b_i.
    Differentiating gives the adjoint system K0' [dx; dnu] = [g_x; 0]; the
    parameter gradients follow the OptNet formulas restricted to diagonal P.
    The elimination basis replicates information already present in qp, so
    the full parameter gradient flows through dqp alone; the basis receives
    zero cotangent (anything else would double-count).
    """
    qp, x, y, elim = res
    with jax.default_matmul_precision("highest"):
        dqp, dx0, dy0 = _solve_bwd_impl(cfg, qp, x, y, g)
    delim = jax.tree.map(jnp.zeros_like, elim)
    return (dqp, dx0, dy0, delim)


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
