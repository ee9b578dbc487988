"""Batched SPD inverse via the sweep operator — one fused TPU kernel.

The QP forward pass inverts ~18 small SPD matrices per planner step (ADMM
normal matrices, polish Hessians/Schur complements, the equality Gram —
all n <= 36 after the round-4 condensation).  The XLA implementation
(ops/qp.py:_gj_inverse_scaled) unrolls n rank-1 steps into ~200 tiny
elementwise ops per inverse; at B=512 each op is launch-bound (~5-10 us),
so the 18 inverses cost ~10x their arithmetic.  This kernel runs the
whole elimination in VMEM in ONE Pallas call.

Design (TPU-first):
  * the SWEEP operator replaces the Jordan exchange: sweeping an SPD
    matrix stays SYMMETRIC at every step (b_jj = -1/d, b_jk = a_jk/d,
    b_ik = a_ik - a_ij a_jk/d), so column j can be read as row j and the
    kernel needs no transposed copy; after sweeping all n pivots the
    buffer holds -A^{-1};
  * batch-on-lanes layout: the matrix batch is transposed to (n, n, B)
    so every step is a handful of (n, n, 128) VPU ops — the batch rides
    the 128-lane axis at full utilization, the n x n face sits on
    sublanes;
  * the n pivot steps are unrolled in the kernel (n <= 36 static), each
    step ~6 vector ops: one fused rank-1 update + masked row/col/corner
    writes.

Like the Jordan exchange, pivot-free sweeping is safe exactly because the
input is Jacobi-scaled + ridged SPD (caller: ops/qp.py:_spd_inverse) —
every pivot is positive and bounded away from zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _sweep_kernel(n: int, m_ref, out_ref):
    A = m_ref[:]                                   # (n, n, L)
    i0 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    for j in range(n):
        row = A[j]                                 # (n, L) == column j (symmetry)
        d = row[j:j + 1, :]                        # (1, L)
        inv_d = 1.0 / d
        rs = row * inv_d                           # (n, L)
        A = A - row[:, None, :] * rs[None, :, :]   # rank-1 downdate
        A = jnp.where(i0 == j, rs[None, :, :], A)  # row j   <- a_jk / d
        A = jnp.where(i1 == j, rs[:, None, :], A)  # col j   <- a_ij / d
        A = jnp.where((i0 == j) & (i1 == j), -inv_d[None, :, :], A)
    out_ref[:] = -A                                # sweep(all) == -A^{-1}


@functools.partial(jax.jit, static_argnames=("interpret",))
def sweep_spd_inverse(M: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Invert a batch of (Jacobi-scaled, ridged) SPD matrices.

    Args:
        M: (B, n, n) float32, symmetric positive definite, n <= ~40.
    Returns:
        (B, n, n) inverses.
    """
    B, n, _ = M.shape
    pad = (-B) % _LANES
    Mt = jnp.moveaxis(M, 0, -1)                    # (n, n, B)
    if pad:
        # pad with identities: every pivot stays 1, no 0-divides
        eye = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype)[:, :, None],
                               (n, n, pad))
        Mt = jnp.concatenate([Mt, eye], axis=-1)
    Bp = B + pad

    out = pl.pallas_call(
        functools.partial(_sweep_kernel, n),
        grid=(Bp // _LANES,),
        in_specs=[pl.BlockSpec((n, n, _LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, _LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), M.dtype),
        interpret=interpret,
    )(Mt)
    return jnp.moveaxis(out[:, :, :B], -1, 0)
