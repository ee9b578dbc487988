"""Experiment: QP solver accuracy vs scipy trust-constr oracle."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax.numpy as jnp
from neupan_tpu.ops.qp import ADMMConfig, QPData, solve_qp
from scipy.optimize import LinearConstraint, minimize


def oracle(P, q, A, l, u, n):
    res = minimize(lambda x: 0.5*x@(P*x)+q@x, np.zeros(n), jac=lambda x: P*x+q,
                   hess=lambda x: np.diag(P), method="trust-constr",
                   constraints=[LinearConstraint(A, l, u)],
                   options={"gtol": 1e-12, "xtol": 1e-12, "maxiter": 3000})
    return res.x


if __name__ == "__main__":
    worst = 0
    for seed in range(8):
        rng = np.random.default_rng(seed)
        n, m = 12, 20
        P = rng.uniform(0.5, 2.0, n); q = rng.normal(size=n)
        A = rng.normal(size=(m, n))
        mid = A @ rng.normal(size=n) * 0.1
        width = rng.uniform(0.5, 2.0, m)
        l, u = mid - width, mid + width
        l[:2] = u[:2] = mid[:2]
        x_ref = oracle(P, q, A, l, u, n)
        qp = QPData(*[jnp.asarray(v, dtype=jnp.float32) for v in (P, q, A, l, u)])
        sol = solve_qp(qp, ADMMConfig(iters=200))
        err = np.abs(np.asarray(sol.x) - x_ref).max()
        worst = max(worst, err)
        print(seed, f"err={err:.2e} rp={float(sol.r_prim):.1e} rd={float(sol.r_dual):.1e}", flush=True)
    print("worst:", worst)
