import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_default_matmul_precision", "highest")
from neupan_tpu.ops.qp import ADMMConfig, QPData, solve_qp
from scipy.optimize import LinearConstraint, minimize

d = np.load("/tmp/hard_qp.npz")
P, q, A, l, u = d["P"], d["q"], d["A"], d["l"], d["u"]
n = P.shape[0]
res = minimize(lambda x: 0.5*x@(P*x)+q@x, np.zeros(n), jac=lambda x: P*x+q,
               hess=lambda x: np.diag(P), method="trust-constr",
               constraints=[LinearConstraint(A, l, u)],
               options={"gtol": 1e-10, "xtol": 1e-12, "maxiter": 5000})
x_ref = res.x
qp = QPData(*[jnp.asarray(v, jnp.float32) for v in (P, q, A, l, u)])
for label, cfg in [
    ("it100 u3", ADMMConfig(iters=100)),
    ("it200 u3", ADMMConfig(iters=200)),
    ("it200 u7", ADMMConfig(iters=200, rho_updates=7)),
]:
    sol = solve_qp(qp, cfg)
    err = np.abs(np.asarray(sol.x) - x_ref).max()
    print(f"{label}: err={err:.3e} rp={float(sol.r_prim):.2e} rd={float(sol.r_dual):.2e}", flush=True)

# random QP regression
def oracle(P,q,A,l,u,n):
    r = minimize(lambda x: 0.5*x@(P*x)+q@x, np.zeros(n), jac=lambda x: P*x+q,
                 hess=lambda x: np.diag(P), method="trust-constr",
                 constraints=[LinearConstraint(A,l,u)],
                 options={"gtol":1e-12,"xtol":1e-12,"maxiter":3000})
    return r.x
worst = 0
for seed in range(6):
    rng = np.random.default_rng(seed)
    n, m = 12, 20
    P2 = rng.uniform(0.5, 2.0, n); q2 = rng.normal(size=n)
    A2 = rng.normal(size=(m, n)); mid = A2 @ rng.normal(size=n) * 0.1
    w = rng.uniform(0.5, 2.0, m); l2, u2 = mid - w, mid + w
    l2[:2] = u2[:2] = mid[:2]
    xr = oracle(P2,q2,A2,l2,u2,n)
    qp2 = QPData(*[jnp.asarray(v, jnp.float32) for v in (P2,q2,A2,l2,u2)])
    sol = solve_qp(qp2, ADMMConfig(iters=200))
    worst = max(worst, np.abs(np.asarray(sol.x)-xr).max())
print("random worst:", worst)
