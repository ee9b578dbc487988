"""Solver experiments on the captured hard NRMP instance."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_default_matmul_precision", "highest")
from neupan_tpu.ops.qp import ADMMConfig, QPData, solve_qp
from scipy.optimize import LinearConstraint, minimize

d = np.load("/tmp/hard_qp.npz")
P, q, A, l, u = d["P"], d["q"], d["A"], d["l"], d["u"]
xw, yw = d["x_warm"], d["y_warm"]
n = P.shape[0]
res = minimize(lambda x: 0.5*x@(P*x)+q@x, np.zeros(n), jac=lambda x: P*x+q,
               hess=lambda x: np.diag(P), method="trust-constr",
               constraints=[LinearConstraint(A, l, u)],
               options={"gtol": 1e-10, "xtol": 1e-12, "maxiter": 5000})
x_ref = res.x
print("oracle obj:", 0.5*x_ref@(P*x_ref)+q@x_ref, flush=True)

qp = QPData(*[jnp.asarray(v, jnp.float32) for v in (P, q, A, l, u)])
for label, cfg, ws in [
    ("cold  it100", ADMMConfig(iters=100), False),
    ("warm  it100", ADMMConfig(iters=100), True),
    ("cold  it400", ADMMConfig(iters=400), False),
    ("cold  it1000", ADMMConfig(iters=1000), False),
    ("cold  it400 rho1", ADMMConfig(iters=400, rho=1.0), False),
    ("cold it400 nopolish", ADMMConfig(iters=400, polish=False), False),
]:
    kw = dict(x0=jnp.asarray(xw), y0=jnp.asarray(yw)) if ws else {}
    sol = solve_qp(qp, cfg, **kw)
    err = np.abs(np.asarray(sol.x) - x_ref).max()
    print(f"{label}: err={err:.3e} rp={float(sol.r_prim):.2e} rd={float(sol.r_dual):.2e}", flush=True)

print("== rho=1 default sweep ==", flush=True)
for label, cfg, ws in [
    ("cold it60", ADMMConfig(iters=60), False),
    ("cold it100", ADMMConfig(iters=100), False),
]:
    sol = solve_qp(qp, cfg)
    err = np.abs(np.asarray(sol.x) - x_ref).max()
    print(f"{label}: err={err:.3e} rp={float(sol.r_prim):.2e} rd={float(sol.r_dual):.2e}", flush=True)
