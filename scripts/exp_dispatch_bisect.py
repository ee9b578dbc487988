"""Bisect which planner sub-program triggers the axon degraded dispatch mode.

Running certain executables once (first found: a vmapped ``M[jnp.ix_(p,p)]``
gather) permanently switches this process's TPU dispatch into a slow mode:
every subsequent call — even a single matmul — pays ~2.4 ms.  The full
planner step triggers it too, so every round-3 benchmark number includes
this overhead.  This script runs ONE candidate sub-program (argv[1]) in a
fresh process and reports the matmul dispatch time before/after.

Usage: for c in pointflow dune_xla dune_pallas coeffs buildqp condens \
              admm polish snap; do python scripts/exp_dispatch_bisect.py $c; done
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *a, iters=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def make_ctx():
    from neupan_tpu.models import obs_point_net
    from neupan_tpu.ops.nrmp import AdjustParams, NRMPSpec
    from neupan_tpu.ops.pan import PANSpec
    from neupan_tpu.ops.qp import ADMMConfig
    from neupan_tpu.robot import Robot

    T, P, K = 10, 256, 10
    robot = Robot.create(receding=T, step_time=0.1, kinematics="diff",
                         max_speed=[8, 1], max_acce=[8, 3],
                         length=1.6, width=2.0)
    nrmp = NRMPSpec(T=T, K=K, kinematics="diff",
                    speed_bound=tuple(robot.speed_bound[:, 0]),
                    acce_bound=tuple(robot.acce_bound[:, 0]))
    spec = PANSpec(robot=robot, nrmp=nrmp, iter_num=2, dune_max_num=P,
                   admm=ADMMConfig(iters=30))
    params = obs_point_net.init_params(jax.random.PRNGKey(0), 2,
                                       robot.edge_dim)
    return spec, params


def main():
    which = sys.argv[1]
    M = jnp.asarray(np.random.default_rng(0).normal(size=(64, 63, 63)),
                    jnp.float32)
    mm = jax.jit(lambda M: M @ M)
    t_before = timeit(mm, M)

    spec, params = make_ctx()
    robot = spec.robot
    T, P, K = robot.T, spec.dune_max_num, spec.nrmp.K
    G = jnp.asarray(robot.G, jnp.float32)
    h = jnp.asarray(robot.h, jnp.float32)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(1.0, 9.0, (2, P)), jnp.float32)
    vels = jnp.zeros((2, P), jnp.float32)
    mask = jnp.ones((P,), bool)
    nom_u = jnp.zeros((2, T), jnp.float32)
    nom_s = robot.rollout(jnp.zeros(3), nom_u)
    ref_s = nom_s
    ref_us = jnp.ones((T,), jnp.float32)

    from neupan_tpu.ops.dune import dune_forward, generate_point_flow
    from neupan_tpu.ops.nrmp import (AdjustParams, build_qp,
                                     coefficients_from_dune, condensation)
    from neupan_tpu.ops import qp as qp_mod

    adjust = AdjustParams(q_s=jnp.asarray(1.0), p_u=jnp.asarray(1.0),
                          eta=jnp.asarray(10.0), d_max=jnp.asarray(1.0),
                          d_min=jnp.asarray(0.1))
    vertices = jnp.asarray(robot.vertices, jnp.float32)

    def get_flow():
        return generate_point_flow(nom_s, pts, vels, robot.dt)

    def get_dune(use_pallas):
        pf, R_all, pg = get_flow()
        return dune_forward(params, G, h, pf, R_all, pg, mask, K,
                            use_pallas=use_pallas, select="exact",
                            vertices=vertices)

    def get_qp():
        dune = get_dune(False)
        fa, fb = coefficients_from_dune(spec.nrmp, dune.mu_k, dune.lam_k,
                                        dune.points_k, dune.valid_k, h,
                                        jnp.any(mask))
        A_dyn, B_dyn, C_dyn = robot.linearize(nom_s, nom_u)
        qp = build_qp(spec.nrmp, adjust, nom_s, nom_u, ref_s, ref_us,
                      A_dyn, B_dyn, C_dyn, fa, fb)
        return qp, A_dyn, B_dyn, C_dyn

    if which == "pointflow":
        fn = jax.jit(lambda: get_flow())
    elif which == "dune_xla":
        fn = jax.jit(lambda: get_dune(False))
    elif which == "dune_pallas":
        fn = jax.jit(lambda: get_dune(True))
    elif which == "coeffs":
        def f():
            dune = get_dune(False)
            return coefficients_from_dune(spec.nrmp, dune.mu_k, dune.lam_k,
                                          dune.points_k, dune.valid_k, h,
                                          jnp.any(mask))
        fn = jax.jit(f)
    elif which == "buildqp":
        fn = jax.jit(lambda: get_qp()[0])
    elif which == "condens":
        def f():
            _, A_dyn, B_dyn, C_dyn = get_qp()
            return condensation(spec.nrmp, A_dyn, B_dyn, C_dyn, nom_s[:, 0])
        fn = jax.jit(f)
    elif which == "admm":
        def f():
            qp, *_ = get_qp()
            cfg = qp_mod.ADMMConfig(iters=30, polish=False)
            return qp_mod._solve_single(qp, cfg, jnp.zeros((spec.nrmp.n,)),
                                        jnp.zeros((spec.nrmp.m,)))
        fn = jax.jit(f)
    elif which == "polish":
        def f():
            qp, A_dyn, B_dyn, C_dyn = get_qp()
            cfg = qp_mod.ADMMConfig(iters=30)
            return qp_mod._solve_single(qp, cfg, jnp.zeros((spec.nrmp.n,)),
                                        jnp.zeros((spec.nrmp.m,)))
        fn = jax.jit(f)
    elif which == "snap":
        def f():
            qp, *_ = get_qp()
            return qp_mod._snap_variable_bounds(qp, jnp.zeros((spec.nrmp.n,)))
        fn = jax.jit(f)
    else:
        raise SystemExit(f"unknown: {which}")

    out = fn()
    jax.block_until_ready(out)
    t_after = timeit(mm, M)
    verdict = "POISONED" if t_after > 5 * max(t_before, 0.05) else "clean"
    print(f"{which:12s} matmul before {t_before:7.3f} ms"
          f"  after {t_after:7.3f} ms   -> {verdict}", flush=True)


if __name__ == "__main__":
    main()
