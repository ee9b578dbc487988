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


def _sweep_body(n: int, A):
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
    return -A                                      # sweep(all) == -A^{-1}


def _sweep_kernel(n: int, m_ref, out_ref):
    out_ref[:] = _sweep_body(n, m_ref[:])          # (n, n, L)


def _sweep_kernel_rolled(n: int, m_ref, out_ref):
    """fori_loop variant for large n: the unrolled kernel's value-SSA form
    keeps ~5 live (n, n, 128) copies (~20 MB at n=90 — VMEM OOM); this
    one updates the (aliased) output ref in place, holding ~2 copies.
    Row/column j are extracted by masked reduction instead of dynamic
    transposes (cheap on the VPU, no relayouts)."""
    i0 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    out_ref[:] = m_ref[:]

    def body(j, carry):
        A = out_ref[:]
        row = jnp.sum(jnp.where(i0 == j, A, 0.0), axis=0,
                      keepdims=True)               # (1, n, L)
        d = jnp.sum(jnp.where(i1[0:1] == j, row, 0.0), axis=1,
                    keepdims=True)                 # (1, 1, L)
        inv_d = 1.0 / d
        rs = row * inv_d                           # (1, n, L)
        col = jnp.sum(jnp.where(i1 == j, A, 0.0), axis=1,
                      keepdims=True)               # (n, 1, L)
        A = A - col * rs
        A = jnp.where(i0 == j, rs, A)
        A = jnp.where(i1 == j, col * inv_d, A)
        A = jnp.where((i0 == j) & (i1 == j), -inv_d, A)
        out_ref[:] = A
        return carry

    jax.lax.fori_loop(0, n, body, 0)
    out_ref[:] = -out_ref[:]


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
    g = Bp // _LANES

    # large matrices use the rolled in-place kernel AND one pallas call
    # per 128-lane chunk (XLA's scoped-vmem placement keeps whole
    # custom-call operands in VMEM; both together bound the footprint
    # at ~2 x 4.4 MB for n=90)
    kern = _sweep_kernel if n <= 64 else _sweep_kernel_rolled

    def one_call(Mc):
        return pl.pallas_call(
            functools.partial(kern, n),
            grid=(Mc.shape[-1] // _LANES,),
            in_specs=[pl.BlockSpec((n, n, _LANES), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, n, _LANES), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(Mc.shape, M.dtype),
            input_output_aliases={0: 0},
            interpret=interpret,
        )(Mc)

    if n <= 64:
        out = one_call(Mt)
    else:
        out = jnp.concatenate(
            [one_call(jax.lax.dynamic_slice_in_dim(Mt, i * _LANES, _LANES,
                                                   axis=2))
             for i in range(g)], axis=-1)
    return jnp.moveaxis(out[:, :, :B], -1, 0)
