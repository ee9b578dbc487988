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
for rho in (0.5, 1.0, 2.0, 5.0, 10.0, 30.0):
    for iters in (100, 200):
        sol = solve_qp(qp, ADMMConfig(iters=iters, rho=rho, rho_updates=0))
        err = np.abs(np.asarray(sol.x) - x_ref).max()
        print(f"rho={rho} it={iters}: err={err:.3e} rp={float(sol.r_prim):.2e} rd={float(sol.r_dual):.2e}", flush=True)
