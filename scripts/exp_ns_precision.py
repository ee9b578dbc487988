"""Experiment: Newton-Schulz iteration-count sweep on the real chip.

Builds realistic NRMP QPs (bench scenario, DUNE-derived obstacle rows),
then times ADMMConfig variants and reports action error vs the ns=40
baseline plus worst KKT error.  Run on TPU (default platform).

Findings (2026-08, B=256 flagship batch): the f32 NS residual floor
(~4e-4) is reached by 16 iterations, diverges at 12; bf16/mixed-precision
front iterations diverge outright (noise floor exceeds the contraction
basin at cond ~1e4).  BUT the bench batch is not representative: on the
corridor-wall golden workload the NRMP optimum is degenerate and the
action moves >1e-3 under any ns change (even 40 -> 64); see
exp_golden_ns.py.  Default stays at 40 — goldens pin it.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_batch, make_flagship
from neupan_tpu.models import obs_point_net
from neupan_tpu.ops.dune import dune_forward, generate_point_flow
from neupan_tpu.ops.nrmp import AdjustParams, build_qp, coefficients_from_dune, unpack_solution
from neupan_tpu.ops.qp import ADMMConfig, kkt_error, solve_qp_batch


def build_realistic_qps(B=256):
    spec = make_flagship()
    G = jnp.asarray(spec.robot.G, jnp.float32)
    h = jnp.asarray(spec.robot.h, jnp.float32)
    params = obs_point_net.init_params(jax.random.PRNGKey(0), 2, spec.robot.edge_dim)
    adjust = AdjustParams(q_s=jnp.asarray(1.0), p_u=jnp.asarray(1.0),
                          eta=jnp.asarray(10.0), d_max=jnp.asarray(1.0),
                          d_min=jnp.asarray(0.1))
    nom_s, nom_u, ref_s, ref_us, pts, vels, mask = make_batch(spec, B)

    @jax.jit
    def assemble(nom_s, nom_u, ref_s, ref_us, pts, vels, mask):
        with jax.default_matmul_precision("highest"):
            def one(nom_s, nom_u, ref_s, ref_us, pts, vels, mask):
                has_points = jnp.any(mask)
                pf, R, glob = generate_point_flow(nom_s, pts, vels, spec.robot.dt)
                dune = dune_forward(params, G, h, pf, R, glob, mask, spec.nrmp.K)
                fa, fb = coefficients_from_dune(spec.nrmp, dune.mu_k, dune.lam_k,
                                                dune.points_k, dune.valid_k, h, has_points)
                A_dyn, B_dyn, C_dyn = spec.robot.linearize(nom_s, nom_u)
                return build_qp(spec.nrmp, adjust, nom_s, nom_u, ref_s, ref_us,
                                A_dyn, B_dyn, C_dyn, fa, fb)
            return jax.vmap(one)(nom_s, nom_u, ref_s, ref_us, pts, vels, mask)

    qp = assemble(nom_s, nom_u, ref_s, ref_us, pts, vels, mask)
    jax.block_until_ready(qp)
    return spec, qp


def run(spec, qp, cfg, iters=5):
    fn = jax.jit(lambda qp: solve_qp_batch(qp, cfg))
    sol = fn(qp)
    jax.block_until_ready(sol)
    t0 = time.perf_counter()
    for _ in range(iters):
        sol = fn(qp)
    jax.block_until_ready(sol)
    dt = (time.perf_counter() - t0) / iters
    return sol, dt


def main():
    B = int(os.environ.get("B", "256"))
    spec, qp = build_realistic_qps(B)
    variants = {
        "baseline ns=40 hi": ADMMConfig(iters=60, ns_iters=40),
        "ns=32 hi":          ADMMConfig(iters=60, ns_iters=32),
        "ns=24 hi (default)": ADMMConfig(iters=60, ns_iters=24),
        "ns=20 hi":          ADMMConfig(iters=60, ns_iters=20),
        "ns=16 hi":          ADMMConfig(iters=60, ns_iters=16),
    }
    base_sol, base_dt = run(spec, qp, variants["baseline ns=40 hi"])
    bu = np.asarray(jax.vmap(lambda x: unpack_solution(spec.nrmp, x)[1])(base_sol.x))
    ek = jax.jit(jax.vmap(lambda q, x, y: kkt_error(q.P_diag, q.q, q.A, q.l, q.u, x, y)))
    base_kkt = np.asarray(ek(qp, base_sol.x, base_sol.y))
    print(f"baseline: {base_dt*1e3:7.1f} ms  kkt p50={np.median(base_kkt):.2e} "
          f"max={base_kkt.max():.2e}", flush=True)

    for name, cfg in variants.items():
        if name == "baseline ns=40 hi":
            continue
        sol, dt = run(spec, qp, cfg)
        u = np.asarray(jax.vmap(lambda x: unpack_solution(spec.nrmp, x)[1])(sol.x))
        derr = np.abs(u - bu).max()
        derr0 = np.abs(u[:, :, 0] - bu[:, :, 0]).max()
        kkt = np.asarray(ek(qp, sol.x, sol.y))
        print(f"{name:26s} {dt*1e3:7.1f} ms  du={derr:.2e} du0={derr0:.2e} "
              f"kkt p50={np.median(kkt):.2e} max={kkt.max():.2e}", flush=True)


if __name__ == "__main__":
    main()
