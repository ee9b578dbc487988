"""Fused Pallas kernel for the condensed-ADMM iteration loop.

The condensed ADMM scan body is three tiny per-scenario matvecs
(As' t: (148,30), Minv rhs: (30,30), As w: (148,30) at T=10) plus ~10
elementwise vector ops — per iteration per scenario that is ~20 kFLOP,
but as an XLA `lax.scan` every iteration pays per-op scheduling and HBM
round-trips for each intermediate.  At the shipped budget (120 + 60
iterations x 2 PAN iterations) the scans dominated what was left of the
round-4 profile after the factorization work was removed.

This kernel runs the ENTIRE fixed-iteration loop in VMEM in one Pallas
call:

  * batch-on-lanes layout: every vector is (dim, 128) with the scenario
    batch riding the lane axis at full VPU utilization; the per-scenario
    operator As lives as (k, m, 128) so both As' t (k rows of
    multiply+sublane-reduce) and As w (k accumulated (m,128) fmas) read
    it with contiguous first-axis indexing;
  * Minv is symmetric (SPD inverse), so Minv @ rhs reads rows as columns
    with no transposed copy;
  * w/z/y stay in registers/VMEM across all iterations — HBM traffic is
    one read of the operator + one write of the result per solve, instead
    of per-iteration round-trips.

VMEM per 128-lane tile at T=10: As 2.3 MB + Minv 0.5 MB + vectors
~0.8 MB.  The wrapper refuses shapes whose operator tile exceeds
``_VMEM_OPERATOR_LIMIT`` (long horizons fall back to the XLA scan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_VMEM_OPERATOR_LIMIT = 6 * 1024 * 1024  # bytes per (k, m, 128) operator tile


def admm_kernel_fits(k: int, m: int) -> bool:
    return k * m * _LANES * 4 <= _VMEM_OPERATOR_LIMIT


def _admm_kernel(k: int, m: int, iters: int, sigma: float, alpha: float,
                 has_soft: bool, minv_ref, ast_ref, qs_ref, ls_ref, us_ref,
                 soft_ref, rho_ref, w0_ref, z0_ref, y0_ref,
                 w_out, z_out, y_out):
    ast = ast_ref[:]                       # (k, m, L)
    qs = qs_ref[:]                         # (k, L)
    ls, us = ls_ref[:], us_ref[:]          # (m, L)
    rho = rho_ref[:]                       # (m, L)
    inv_rho = 1.0 / rho
    if has_soft:
        soft = soft_ref[:]
        is_soft = soft > 0.0
        soft_fac = rho / (rho + soft)

    def body(_, carry):
        w, z, y = carry
        t = rho * z - y                                      # (m, L)
        rows = [jnp.sum(ast[i] * t, axis=0, keepdims=True)   # (1, L)
                for i in range(k)]
        rhs = sigma * w - qs + jnp.concatenate(rows, axis=0)  # (k, L)
        w_t = rhs[0:1, :] * minv_ref[0]
        for b in range(1, k):
            w_t = w_t + rhs[b:b + 1, :] * minv_ref[b]        # (k, L)
        z_t = w_t[0:1, :] * ast[0]
        for i in range(1, k):
            z_t = z_t + w_t[i:i + 1, :] * ast[i]             # (m, L)
        w_new = alpha * w_t + (1.0 - alpha) * w
        z_mix = alpha * z_t + (1.0 - alpha) * z
        v = z_mix + y * inv_rho
        z_hard = jnp.clip(v, ls, us)
        if has_soft:
            z_sf = jnp.where(v >= ls, v, ls + (v - ls) * soft_fac)
            z_new = jnp.where(is_soft, jnp.minimum(z_sf, us), z_hard)
        else:
            z_new = z_hard
        y_new = y + rho * (z_mix - z_new)
        return (w_new, z_new, y_new)

    w, z, y = jax.lax.fori_loop(
        0, iters, body, (w0_ref[:], z0_ref[:], y0_ref[:]))
    w_out[:] = w
    z_out[:] = z
    y_out[:] = y


@functools.partial(jax.jit, static_argnames=("iters", "sigma", "alpha",
                                             "has_soft", "interpret"))
def admm_iterate(Minv: jnp.ndarray, As: jnp.ndarray, qs: jnp.ndarray,
                 ls: jnp.ndarray, us: jnp.ndarray, soft: jnp.ndarray,
                 rho: jnp.ndarray, w0: jnp.ndarray, z0: jnp.ndarray,
                 y0: jnp.ndarray, *, iters: int, sigma: float, alpha: float,
                 has_soft: bool, interpret: bool = False):
    """Run ``iters`` condensed-ADMM iterations for a batch of QPs.

    Args (all batched on axis 0):
        Minv: (B, k, k) symmetric normal-matrix inverse.
        As:   (B, m, k) scaled constraint operator.
        qs:   (B, k); ls/us/soft/rho: (B, m); w0: (B, k); z0/y0: (B, m).
    Returns:
        (w, z, y): (B, k), (B, m), (B, m).
    """
    B, m, k = As.shape
    pad = (-B) % _LANES
    Bp = B + pad

    def tr(a):  # batch -> lanes
        a = jnp.moveaxis(a, 0, -1)
        if pad:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
        return a

    minv_t = tr(Minv)                          # (k, k, Bp)
    ast_t = tr(jnp.swapaxes(As, 1, 2))         # (k, m, Bp)
    qs_t, ls_t, us_t = tr(qs), tr(ls), tr(us)
    soft_t, w0_t, z0_t, y0_t = tr(soft), tr(w0), tr(z0), tr(y0)
    # padded lanes: rho=1 avoids 0-divides; ls/us stay 0 -> z stays 0
    rho_t = tr(rho)
    if pad:
        rho_t = rho_t.at[:, B:].set(1.0)

    def spec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape + (_LANES,),
                            (lambda i, nd=nd: (0,) * nd + (i,)),
                            memory_space=pltpu.VMEM)

    w, z, y = pl.pallas_call(
        functools.partial(_admm_kernel, k, m, iters, sigma, alpha, has_soft),
        grid=(Bp // _LANES,),
        in_specs=[spec(k, k), spec(k, m), spec(k), spec(m), spec(m),
                  spec(m), spec(m), spec(k), spec(m), spec(m)],
        out_specs=(spec(k), spec(m), spec(m)),
        out_shape=(jax.ShapeDtypeStruct((k, Bp), As.dtype),
                   jax.ShapeDtypeStruct((m, Bp), As.dtype),
                   jax.ShapeDtypeStruct((m, Bp), As.dtype)),
        interpret=interpret,
    )(minv_t, ast_t, qs_t, ls_t, us_t, soft_t, rho_t, w0_t, z0_t, y0_t)
    return (jnp.moveaxis(w[:, :B], -1, 0), jnp.moveaxis(z[:, :B], -1, 0),
            jnp.moveaxis(y[:, :B], -1, 0))
