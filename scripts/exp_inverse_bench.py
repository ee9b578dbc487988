"""Microbenchmark: SPD inverse strategies for the QP hot path on TPU.

VERDICT round-3 item #1: the per-solve factorization cost dominates the QP
(BENCH_COMPONENTS.json: ~22 of 24.8 ms are _spd_inverse calls).  XLA's
cholesky + triangular_solve lower to sequential small-step loops on TPU —
~1000x off the MXU roofline for (256, 63, 63).  This experiment measures
matmul-only alternatives:

  dense     — current _spd_inverse (cholesky + cho_solve vs identity)
  chol_only — jnp.linalg.cholesky alone (floor for factor-based paths)
  trtri     — cholesky + blocked divide&conquer triangular inverse
              (LAPACK trtri structure: all matmuls above the base size)
  schur     — cholesky-free recursive block-Schur SPD inverse
              (all matmuls above the base size)

Accuracy is reported as ||M X - I||_inf on REAL NRMP normal matrices
(rho_eq_scale 1e3 makes them genuinely ill-conditioned, cond ~1e7).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neupan_tpu.ops import qp as qp_mod
from scripts.bench_banded import make_M


def _pad_spd(M, n_pad):
    """Embed M in an (n_pad, n_pad) identity block."""
    n = M.shape[-1]
    if n == n_pad:
        return M
    pad = [(0, 0)] * (M.ndim - 2) + [(0, n_pad - n), (0, n_pad - n)]
    Mp = jnp.pad(M, pad)
    idx = jnp.arange(n, n_pad)
    return Mp.at[..., idx, idx].set(1.0)


def tri_inv(L, base=8):
    """Inverse of lower-triangular L (power-of-2 size) via block recursion.

    inv([[A,0],[B,C]]) = [[A^-1, 0], [-C^-1 B A^-1, C^-1]] — every op above
    the base size is a matmul (MXU), the base uses XLA's triangular solve.
    """
    n = L.shape[-1]
    if n <= base:
        eye = jnp.eye(n, dtype=L.dtype)
        return jax.scipy.linalg.solve_triangular(
            L, jnp.broadcast_to(eye, L.shape), lower=True)
    k = n // 2
    A = L[..., :k, :k]
    B = L[..., k:, :k]
    C = L[..., k:, k:]
    Ai = tri_inv(A, base)
    Ci = tri_inv(C, base)
    Bi = -Ci @ (B @ Ai)
    z = jnp.zeros(L.shape[:-2] + (k, k), L.dtype)
    top = jnp.concatenate([Ai, z], axis=-1)
    bot = jnp.concatenate([Bi, Ci], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spd_inv_schur(M, base=8):
    """Cholesky-free SPD inverse by recursive 2x2 block Schur complement."""
    n = M.shape[-1]
    if n <= base:
        ch = jnp.linalg.cholesky(M)
        eye = jnp.eye(n, dtype=M.dtype)
        return jax.scipy.linalg.cho_solve(
            (ch, True), jnp.broadcast_to(eye, M.shape))
    k = n // 2
    A = M[..., :k, :k]
    Bt = M[..., :k, k:]
    C = M[..., k:, k:]
    Ai = spd_inv_schur(A, base)
    AiB = Ai @ Bt
    S = C - Bt.swapaxes(-1, -2) @ AiB
    Si = spd_inv_schur(S, base)
    TR = -AiB @ Si
    TL = Ai - TR @ AiB.swapaxes(-1, -2)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([TR.swapaxes(-1, -2), Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _scaled(M):
    """Jacobi scaling + ridge, identical to _spd_inverse's conditioning."""
    n = M.shape[-1]
    dj = jax.lax.rsqrt(jnp.abs(jnp.diagonal(M, axis1=-2, axis2=-1)) + 1e-30)
    Mt = M * dj[..., :, None] * dj[..., None, :]
    Mt = Mt + 1e-7 * jnp.eye(n, dtype=M.dtype)
    return Mt, dj


def inv_trtri(M, base=8):
    n = M.shape[-1]
    n_pad = 1 << (n - 1).bit_length()
    Mt, dj = _scaled(M)
    Mp = _pad_spd(Mt, n_pad)
    L = jnp.linalg.cholesky(Mp)
    Li = tri_inv(L, base)
    X = (Li.swapaxes(-1, -2) @ Li)[..., :n, :n]
    return X * dj[..., :, None] * dj[..., None, :]


def inv_schur(M, base=8):
    n = M.shape[-1]
    n_pad = 1 << (n - 1).bit_length()
    Mt, dj = _scaled(M)
    Mp = _pad_spd(Mt, n_pad)
    X = spd_inv_schur(Mp, base)[..., :n, :n]
    return X * dj[..., :, None] * dj[..., None, :]


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(B=256):
    cfg = qp_mod.ADMMConfig()
    for n_label, T in (("63 (T=10)", 10), ("183 (T=30)", 30)):
        Ms, _ = make_M(T, B)
        n = Ms.shape[-1]
        eye = jnp.eye(n)

        with jax.default_matmul_precision("highest"):
            dense = jax.jit(jax.vmap(lambda M: qp_mod._spd_inverse(M, cfg)))
            cholo = jax.jit(lambda M: jnp.linalg.cholesky(
                _pad_spd(_scaled(M)[0], 1 << (n - 1).bit_length())))
            f_trtri = jax.jit(lambda M: inv_trtri(M))
            f_schur = jax.jit(lambda M: inv_schur(M))
            f_trtri16 = jax.jit(lambda M: inv_trtri(M, base=16))
            f_schur16 = jax.jit(lambda M: inv_schur(M, base=16))

            resid = jax.jit(lambda X: jnp.max(jnp.abs(
                jnp.einsum("bij,bjk->bik", Ms, X) - eye)))

            rows = {}
            for name, fn in [("dense", dense), ("chol_only", cholo),
                             ("trtri8", f_trtri), ("trtri16", f_trtri16),
                             ("schur8", f_schur), ("schur16", f_schur16)]:
                t = timeit(fn, Ms)
                if name == "chol_only":
                    err = float("nan")
                else:
                    err = float(resid(fn(Ms)))
                rows[name] = (t * 1e3, err)
                print(f"n={n_label:10s} {name:10s} {t*1e3:8.3f} ms"
                      f"   err {err:.2e}", flush=True)


if __name__ == "__main__":
    main(int(os.environ.get("BENCH_BATCH", "256")))
