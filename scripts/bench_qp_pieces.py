"""Microbenchmark of the QP solver's internal stages on the current backend.

Separates the fixed per-solve costs (assembly, Ruiz equilibration, normal-
matrix formation, SPD inverses, polish) from the marginal ADMM iteration
cost, to aim optimization work at the dominant piece.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_batch, make_flagship
from neupan_tpu.ops.nrmp import AdjustParams, build_qp
from neupan_tpu.ops import qp as qp_mod
from neupan_tpu.ops.qp import ADMMConfig, QPData


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(B=256):
    spec = make_flagship()
    adjust = AdjustParams(q_s=jnp.asarray(1.0), p_u=jnp.asarray(1.0),
                          eta=jnp.asarray(10.0), d_max=jnp.asarray(1.0),
                          d_min=jnp.asarray(0.1))
    nom_s, nom_u, ref_s, ref_us, pts, vels, mask = make_batch(spec, B)
    rng = np.random.default_rng(0)
    T, K = spec.nrmp.T, spec.nrmp.K
    fa = jnp.asarray(rng.normal(size=(B, T, K, 2)) * 0.3, jnp.float32)
    fb = jnp.asarray(rng.normal(size=(B, T, K)) - 1.0, jnp.float32)
    cfg = spec.admm

    def assemble(nom_s, nom_u, ref_s, ref_us, fa, fb):
        def one(nom_s, nom_u, ref_s, ref_us, fa, fb):
            A_dyn, B_dyn, C_dyn = spec.robot.linearize(nom_s, nom_u)
            return build_qp(spec.nrmp, adjust, nom_s, nom_u, ref_s, ref_us,
                            A_dyn, B_dyn, C_dyn, fa, fb)
        return jax.vmap(one)(nom_s, nom_u, ref_s, ref_us, fa, fb)

    assemble_j = jax.jit(assemble)
    qp = assemble_j(nom_s, nom_u, ref_s, ref_us, fa, fb)
    print(f"assemble (B={B}): {timeit(assemble_j, nom_s, nom_u, ref_s, ref_us, fa, fb)*1e3:.2f} ms", flush=True)

    with jax.default_matmul_precision("highest"):
        ruiz_j = jax.jit(jax.vmap(lambda q: qp_mod._ruiz_equilibrate(q)[0]))
        print(f"ruiz x10: {timeit(ruiz_j, qp)*1e3:.2f} ms", flush=True)
        qps = ruiz_j(qp)

        def mform(qs):
            def one(q):
                rho = qp_mod._rho_vec(q.l, q.u, cfg)
                return jnp.diag(q.P_diag + cfg.sigma) + (q.A.T * rho) @ q.A
            return jax.vmap(one)(qs)

        mform_j = jax.jit(mform)
        M = mform_j(qps)
        print(f"M = P+A'rhoA: {timeit(mform_j, qps)*1e3:.2f} ms", flush=True)

        inv_j = jax.jit(lambda M: qp_mod._spd_inverse(M, cfg))
        print(f"spd_inverse chol (63x63 xB): {timeit(inv_j, M)*1e3:.2f} ms", flush=True)

        Minv = inv_j(M)
        n = M.shape[-1]

        def iters_only(qs, Minv, k):
            def one(q, Mi):
                x = jnp.zeros((n,), q.P_diag.dtype)
                z = jnp.zeros((q.A.shape[0],), q.P_diag.dtype)
                y = jnp.zeros_like(z)
                rho = qp_mod._rho_vec(q.l, q.u, cfg)

                def body(c, _):
                    x, z, y = c
                    rhs = cfg.sigma * x - q.q + q.A.T @ (rho * z - y)
                    x_t = Mi @ rhs
                    z_t = q.A @ x_t
                    z_new = jnp.clip(z_t + y / rho, q.l, q.u)
                    y_new = y + rho * (z_t - z_new)
                    return (x_t, z_new, y_new), None

                (x, z, y), _ = jax.lax.scan(body, (x, z, y), None, length=k)
                return x
            return jax.vmap(lambda q, Mi: one(q, Mi))(qs, Minv)

        for k in (100, 400):
            f = jax.jit(lambda qs, Mi, k=k: iters_only(qs, Mi, k))
            print(f"{k} admm iters: {timeit(f, qps, Minv)*1e3:.2f} ms", flush=True)

        # polish (2 candidates) on the raw problem
        def polish_only(qs):
            def one(q):
                x = jnp.zeros((n,), q.P_diag.dtype)
                y = jnp.zeros((q.A.shape[0],), q.P_diag.dtype)
                xo, yo, _, _, _ = qp_mod._polish(q, cfg, x, y)
                return xo
            return jax.vmap(one)(qs)

        pol_j = jax.jit(polish_only)
        print(f"polish (2 candidates): {timeit(pol_j, qp)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(os.environ.get("BENCH_BATCH", "256")))
