"""Block-tridiagonal vs dense SPD inverse for the NRMP normal matrix.

VERDICT round-2 item #2: exploit the horizon-banded structure at the
FACTORIZATION level and record the dense/banded crossover at T=10 vs
T=30.  Writes the result into BENCH_COMPONENTS.json (merged by
bench_components.py).

Usage: python scripts/bench_banded.py          (real TPU via axon)
       JAX_PLATFORMS=cpu python scripts/...    (CPU correctness check)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neupan_tpu.ops import banded, qp as qp_mod
from neupan_tpu.ops.nrmp import AdjustParams, NRMPSpec, build_qp
from neupan_tpu.ops.qp import ADMMConfig
from neupan_tpu.robot import Robot


def make_M(T, B, seed=0):
    """Real NRMP normal matrices M = diag(P+sigma) + A' R A at horizon T."""
    rng = np.random.default_rng(seed)
    robot = Robot.create(receding=T, step_time=0.1, kinematics="diff",
                         max_speed=[8, 1], max_acce=[8, 3], length=1.6,
                         width=2.0)
    spec = NRMPSpec(T=T, K=10, kinematics="diff",
                    speed_bound=tuple(robot.speed_bound[:, 0]),
                    acce_bound=tuple(robot.acce_bound[:, 0]))
    adjust = AdjustParams(q_s=jnp.asarray(1.0), p_u=jnp.asarray(1.0),
                          eta=jnp.asarray(10.0), d_max=jnp.asarray(1.0),
                          d_min=jnp.asarray(0.1))
    cfg = ADMMConfig()

    def one(seed):
        r = np.random.default_rng(seed)
        nom_u = jnp.asarray(r.uniform(-0.5, 0.5, (2, T)), jnp.float32)
        nom_s = robot.rollout(jnp.zeros(3), nom_u)
        ref_s = nom_s
        ref_us = jnp.ones((T,), jnp.float32)
        A_dyn, B_dyn, C_dyn = robot.linearize(nom_s, nom_u)
        fa = jnp.asarray(r.normal(size=(T, 10, 2)) * 0.3, jnp.float32)
        fb = jnp.asarray(r.normal(size=(T, 10)) - 1.0, jnp.float32)
        qp = build_qp(spec, adjust, nom_s, nom_u, ref_s, ref_us,
                      A_dyn, B_dyn, C_dyn, fa, fb)
        rho = qp_mod._rho_vec(qp.l, qp.u, cfg)
        return jnp.diag(qp.P_diag + cfg.sigma) + (qp.A.T * rho) @ qp.A

    Ms = jnp.stack([one(s) for s in range(B)])
    return Ms, spec


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(B=256):
    cfg = ADMMConfig()
    results = {}
    for T in (10, 30):
        Ms, spec = make_M(T, B)
        n = Ms.shape[-1]
        # numpy on purpose: a closure-captured jax Array permanently
        # degrades axon dispatch (scripts/exp_dispatch_trigger.py) — and
        # DID: the round-3 "dense 4.82 ms" figure in BENCH_BANDED.json was
        # measured in the degraded mode this very capture triggered.
        perm = banded.nrmp_permutation(T)

        def _dense(M):
            with jax.default_matmul_precision("highest"):
                return qp_mod._spd_inverse(M, cfg)

        def _band(M):
            with jax.default_matmul_precision("highest"):
                return banded.btd_spd_inverse(M, perm, 6)

        dense = jax.jit(jax.vmap(_dense))
        band = jax.jit(jax.vmap(_band))

        Xd = dense(Ms)
        Xb = band(Ms)
        # correctness: ||M X - I||_inf (f32 matmuls — the bf16 default
        # corrupts the check itself on TPU)
        eye = jnp.eye(n)
        with jax.default_matmul_precision("highest"):
            resid = jax.jit(lambda X: jnp.max(jnp.abs(
                jnp.einsum("bij,bjk->bik", Ms, X) - eye)))
            errd = float(resid(Xd))
            errb = float(resid(Xb))

        td = timeit(dense, Ms)
        tb = timeit(band, Ms)
        print(f"T={T} (n={n}, B={B}): dense {td*1e3:.2f} ms (err {errd:.1e})"
              f"  banded {tb*1e3:.2f} ms (err {errb:.1e})"
              f"  speedup {td/tb:.2f}x", flush=True)
        results[f"T{T}"] = dict(n=n, dense_ms=round(td * 1e3, 2),
                                banded_ms=round(tb * 1e3, 2),
                                dense_err=errd, banded_err=errb,
                                speedup=round(td / tb, 2))
    out = dict(metric="btd_vs_dense_spd_inverse", B=B,
               backend=jax.default_backend(), results=results)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_BANDED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main(int(os.environ.get("BENCH_BATCH", "256")))
