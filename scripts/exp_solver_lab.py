"""Offline solver lab: evaluate ADMM/polish variants on the recorded
corridor QP library (/tmp/qp_library.npz, from make_qp_library.py).

For each variant prints KKT / objective-gap / violation percentiles and the
fraction of instances reaching kkt<=1e-3 and <=1e-4 — the round-3 question
is which variant converges on the hinge-active instances the round-2
default leaves at kkt ~ 1e-1.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("NEUPAN_PLATFORM", "cpu")  # hard-set: ambient axon otherwise leaks in (docs/AXON_DISPATCH.md)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

from neupan_tpu.ops import qp as qp_mod  # noqa: E402
from neupan_tpu.ops.qp import ADMMConfig, QPData  # noqa: E402


def load_library(path="/tmp/qp_library.npz"):
    z = np.load(path, allow_pickle=False)
    n = int(z["n_instances"])
    fields = {}
    for key in ("P", "q", "A", "l", "u", "soft", "x_warm", "y_warm", "x_ref"):
        fields[key] = np.stack([z[f"{i}_{key}"] for i in range(n)])
    fields["tags"] = z["tags"]
    fields["steps"] = z["steps"]
    return fields


def f64_kkt(P, q, A, l, u, soft, x, y):
    """Full KKT error in float64 (mirror of qp.kkt_error)."""
    Ax = A @ x
    stat = np.max(np.abs(P * x + q + A.T @ y))
    is_soft = soft > 0
    viol_r = np.maximum(np.maximum(Ax - u, l - Ax), 0.0)
    y_pos, y_neg = np.maximum(y, 0), np.maximum(-y, 0)
    comp_u = np.minimum(y_pos, np.abs(u - Ax))
    comp_l = np.minimum(y_neg, np.abs(Ax - l))
    dual_err = np.abs(y - soft * np.minimum(Ax - l, 0.0))
    viol_r = np.where(is_soft, dual_err, viol_r)
    comp_u = np.where(is_soft, 0.0, comp_u)
    comp_l = np.where(is_soft, 0.0, comp_l)
    return max(stat, viol_r.max(), comp_u.max(), comp_l.max())


def objective(P, q, A, l, soft, x):
    r = np.minimum(A @ x - l, 0.0) * (soft > 0)
    return 0.5 * x @ (P * x) + q @ x + 0.5 * np.sum(soft * r * r)


def hard_viol(A, l, u, soft, x):
    Ax = A @ x
    v = np.maximum(np.maximum(Ax - u, l - Ax), 0.0)
    return float(np.max(v * (soft <= 0)))


def evaluate(lib, cfg, name, warm=True, solver=None):
    f32 = jnp.float32
    qps = QPData(P_diag=jnp.asarray(lib["P"], f32),
                 q=jnp.asarray(lib["q"], f32),
                 A=jnp.asarray(lib["A"], f32),
                 l=jnp.asarray(lib["l"], f32),
                 u=jnp.asarray(lib["u"], f32),
                 soft=jnp.asarray(lib["soft"], f32))
    B, n = lib["P"].shape
    m = lib["A"].shape[1]
    x0 = jnp.asarray(lib["x_warm"], f32) if warm else jnp.zeros((B, n), f32)
    y0 = jnp.asarray(lib["y_warm"], f32) if warm else jnp.zeros((B, m), f32)

    if solver is None:
        def solver(q, x0_, y0_):
            return qp_mod.solve_qp(q, cfg, x0_, y0_)

    sol = jax.jit(jax.vmap(solver))(qps, x0, y0)
    X = np.asarray(sol.x, np.float64)
    Y = np.asarray(sol.y, np.float64)

    kkts, gaps, viols = [], [], []
    for i in range(B):
        P, q, A, l, u, soft = (lib["P"][i], lib["q"][i], lib["A"][i],
                               lib["l"][i], lib["u"][i], lib["soft"][i])
        kkts.append(f64_kkt(P, q, A, l, u, soft, X[i], Y[i]))
        f_ref = objective(P, q, A, l, soft, lib["x_ref"][i])
        gaps.append((objective(P, q, A, l, soft, X[i]) - f_ref)
                    / (1.0 + abs(f_ref)))
        viols.append(hard_viol(A, l, u, soft, X[i]))
    kkts, gaps, viols = map(np.asarray, (kkts, gaps, viols))
    print(f"{name:42s} kkt p50={np.median(kkts):.1e} p90={np.percentile(kkts,90):.1e} "
          f"max={kkts.max():.1e} <=1e-3:{np.mean(kkts<=1e-3):.2f} "
          f"gap max={gaps.max():+.1e} viol max={viols.max():.1e}", flush=True)
    return dict(kkt=kkts, gap=gaps, viol=viols)


if __name__ == "__main__":
    lib = load_library()
    print(f"{len(lib['P'])} instances "
          f"({np.sum(lib['tags'] == 'arrive300')} arrive300, "
          f"{np.sum(lib['tags'] == 'stuck150')} stuck150)")
    base = ADMMConfig()
    evaluate(lib, base, "default (300 it, 2 rounds) warm")
    evaluate(lib, base, "default cold", warm=False)
    evaluate(lib, dataclasses.replace(base, iters=150),
             "150 it, 2 rounds warm")
    evaluate(lib, dataclasses.replace(base, iters=600, polish_rounds=4),
             "600 it, 4 rounds warm")
