"""Fused Pallas kernel for the box-eliminating polish candidate solve.

The polish EQP candidate (ops/qp.py:_polish_candidate_condensed_box) is
a chain of ~80 tiny batched ops per candidate — two masked-Hessian
inverses ((30,30) and (18,18)), a dual-Schur build, one KKT solve and
``refine_steps`` refinement passes, all on (k,)/(n_acc,) vectors — and
the planner runs 10 candidates per step (polish_rounds x 2 PAN
iterations).  At B=512 each op is launch-bound, so the chain costs
~3.5 ms/step of pure scheduling.  This kernel runs the WHOLE candidate
solve in VMEM per 128-lane batch tile:

  * batch-on-lanes layout as in ops/pallas/{sweep,admm}.py;
  * both SPD inverses use the in-register symmetric sweep elimination
    (ops/pallas/sweep.py:_sweep_body) on Jacobi-scaled + ridged inputs —
    the same math as ops/qp.py:_spd_inverse;
  * the reduced-space refinement (grad_r = C0 - Hr_ref w) iterates with
    w/yn in registers.

The XLA single-scenario path in ops/qp.py remains the reference; the
batched planner path dispatches here via custom_vmap
(ops/qp.py:_box_candidate_loop).  Equivalence is pinned in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neupan_tpu.ops.pallas.sweep import _sweep_body

_LANES = 128


def _spd_inv_inline(n: int, M):
    """Jacobi scale + ridge + sweep inverse of an (n, n, L) SPD slab —
    the in-kernel equivalent of ops/qp.py:_spd_inverse's small-n path."""
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1))
    diag = jnp.sum(jnp.where(eye, M, 0.0), axis=1, keepdims=True)  # (n,1,L)
    dj = jax.lax.rsqrt(jnp.abs(diag) + 1e-30)                      # (n,1,L)
    # (1, n, L) counterpart extracted by the axis-0 reduce (no transpose:
    # sublane<->outer swaps are relayouts Mosaic handles poorly)
    diagT = jnp.sum(jnp.where(eye, M, 0.0), axis=0, keepdims=True)
    djT = jax.lax.rsqrt(jnp.abs(diagT) + 1e-30)                    # (1,n,L)
    Mt = M * dj * djT + jnp.where(eye, 1e-7, 0.0)
    X = _sweep_body(n, Mt)
    return X * dj * djT


def _matvec(n_out: int, A, v):
    """A (n_out, n_in, L) @ v (n_in, L) -> (n_out, L) via row reduces."""
    rows = [jnp.sum(A[i] * v, axis=0, keepdims=True) for i in range(n_out)]
    return jnp.concatenate(rows, axis=0)


def _matvec_sym(n: int, A, v):
    """Symmetric A (n, n, L) @ v (n, L) via column-accumulated fmas."""
    out = A[0] * v[0:1, :]
    for j in range(1, n):
        out = out + A[j] * v[j:j + 1, :]
    return out


def _matvec_T(n_in: int, A, u):
    """A.T for A (n_in, n_out, L): sum_b A[b] * u[b] -> (n_out, L)."""
    out = A[0] * u[0:1, :]
    for b in range(1, n_in):
        out = out + A[b] * u[b:b + 1, :]
    return out


def _box_candidate_kernel(k: int, na: int, refine: int,
                          hr_ref_, hrr_ref, dan_ref, c0_ref, g1r_ref,
                          g2n_ref, bbox_ref, fix_ref, d_ref,
                          w_out, yn_out):
    hr = hr_ref_[:]                       # (k, k, L)  Z'PrZ + SZ'SZ
    hr_true = hrr_ref[:]                  # (k, k, L)  no-sigma Hessian
    dan = dan_ref[:]                      # (na, k, L) normalized acc rows
    c0 = c0_ref[:]                        # (k, L)
    g1r = g1r_ref[:]                      # (k, L)
    g2n = g2n_ref[:]                      # (na, L)
    b_box = bbox_ref[:]                   # (k, L)
    fix = fix_ref[:]                      # (k, L)
    d = d_ref[:]                          # (na, L)
    free = 1.0 - fix

    eye_k = (jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1))
    eye_a = (jax.lax.broadcasted_iota(jnp.int32, (na, na, 1), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (na, na, 1), 1))

    # masked Hessian + inverse
    Hm = hr * free[:, None, :] * free[None, :, :] + \
        jnp.where(eye_k, fix[:, None, :], 0.0)
    Hm_inv = _spd_inv_inline(k, Hm)       # symmetric

    # dual Schur over the acc rows: S = DAn Hm^{-1} DAn' + diag(1-d)+1e-6
    hd = [_matvec_sym(k, Hm_inv, dan[b]) for b in range(na)]  # na x (k, L)
    s_rows = []
    for b in range(na):
        row = [jnp.sum(dan[c] * hd[b], axis=0, keepdims=True)
               for c in range(na)]
        s_rows.append(jnp.concatenate(row, axis=0)[None])     # (1, na, L)
    S = jnp.concatenate(s_rows, axis=0)                       # (na, na, L)
    S = S + jnp.where(eye_a, ((1.0 - d) + 1e-6)[:, None, :], 0.0)
    S_inv = _spd_inv_inline(na, S)

    def kkt_solve(r1, r_fix, r2n):
        t = free * (r1 - _matvec_sym(k, hr, fix * r_fix)) + fix * r_fix
        dw0 = _matvec_sym(k, Hm_inv, t)
        u = _matvec(na, dan, dw0)
        dyn = _matvec_sym(na, S_inv, u - r2n)
        v = _matvec_sym(k, Hm_inv, free * _matvec_T(na, dan, dyn))
        return dw0 - v, dyn

    w, yn = kkt_solve(g1r, b_box, g2n)
    for _ in range(refine):
        grad_r = c0 - _matvec_sym(k, hr_true, w)
        r1 = grad_r - _matvec_T(na, dan, d * yn)
        r_fix = b_box - w
        r2n = g2n - (_matvec(na, dan, w) + (1.0 - d) * yn)
        dw, dyn = kkt_solve(r1, fix * r_fix, r2n)
        w = w + dw
        yn = yn + dyn

    w_out[:] = w
    yn_out[:] = yn


@functools.partial(jax.jit, static_argnames=("refine", "interpret"))
def box_candidate(Hr, Hr_true, DAn, C0, g1r, g2n, b_box, fix, d,
                  *, refine: int, interpret: bool = False):
    """Batched box-elim polish candidate solve.

    Args (batched on axis 0): Hr/Hr_true (B, k, k), DAn (B, na, k),
    C0/g1r/b_box/fix (B, k), g2n/d (B, na).
    Returns (w (B, k), yn (B, na)).
    """
    B, k, _ = Hr.shape
    na = DAn.shape[1]
    pad = (-B) % _LANES

    def tr(a):
        a = jnp.moveaxis(a, 0, -1)
        if pad:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
        return a

    Bp = B + pad
    args = [tr(Hr), tr(Hr_true), tr(DAn), tr(C0), tr(g1r), tr(g2n),
            tr(b_box), tr(fix), tr(d)]
    # padded lanes: Hr=0 would make Hm singular; set padded Hm to identity
    # by padding fix=1 (every coordinate pinned -> Hm = I) and d=0
    if pad:
        args[7] = args[7].at[:, B:].set(1.0)

    def spec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape + (_LANES,),
                            (lambda i, nd=nd: (0,) * nd + (i,)),
                            memory_space=pltpu.VMEM)

    w, yn = pl.pallas_call(
        functools.partial(_box_candidate_kernel, k, na, refine),
        grid=(Bp // _LANES,),
        in_specs=[spec(k, k), spec(k, k), spec(na, k), spec(k), spec(k),
                  spec(na), spec(k), spec(k), spec(na)],
        out_specs=(spec(k), spec(na)),
        out_shape=(jax.ShapeDtypeStruct((k, Bp), Hr.dtype),
                   jax.ShapeDtypeStruct((na, Bp), Hr.dtype)),
        interpret=interpret,
    )(*args)
    return jnp.moveaxis(w[:, :B], -1, 0), jnp.moveaxis(yn[:, :B], -1, 0)
