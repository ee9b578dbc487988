"""Component-level TPU benchmark: DUNE vs QP vs full step."""
import json
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
from neupan_tpu.ops.nrmp import AdjustParams, build_qp
from neupan_tpu.ops.qp import ADMMConfig, QPData, solve_qp
from neupan_tpu.parallel import batched_init_state, batched_planner_step


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(B=256):
    spec = make_flagship()
    G = jnp.asarray(spec.robot.G, jnp.float32)
    h = jnp.asarray(spec.robot.h, jnp.float32)
    params = obs_point_net.init_params(jax.random.PRNGKey(0), 2,
                                       spec.robot.edge_dim)
    adjust = AdjustParams(q_s=jnp.asarray(1.0), p_u=jnp.asarray(1.0),
                          eta=jnp.asarray(10.0), d_max=jnp.asarray(1.0),
                          d_min=jnp.asarray(0.1))
    nom_s, nom_u, ref_s, ref_us, pts, vels, mask = make_batch(spec, B)

    # --- DUNE (one PAN iteration worth), spec-default path -------------
    vertices = (jnp.asarray(spec.robot.vertices, jnp.float32)
                if spec.dune_select == "exact" else None)
    use_pallas = spec.use_dune_pallas()

    @jax.jit
    def dune_only(nom_s, pts, vels, mask):
        with jax.default_matmul_precision("highest"):
            def one(nom_s, pts, vels, mask):
                pf, R, glob = generate_point_flow(nom_s, pts, vels, spec.robot.dt)
                return dune_forward(params, G, h, pf, R, glob, mask, spec.nrmp.K,
                                    use_pallas=use_pallas,
                                    select=spec.dune_select, vertices=vertices)
            return jax.vmap(one)(nom_s, pts, vels, mask)

    t_dune = timeit(dune_only, nom_s, pts, vels, mask)
    print(f"dune ({spec.dune_select}"
          f"{'+pallas' if use_pallas else ''}, 1 iter, B={B}): "
          f"{t_dune*1e3:.1f} ms", flush=True)

    # --- QP assembly + solve (one PAN iteration worth) ----------------
    rng = np.random.default_rng(0)
    T, K = spec.nrmp.T, spec.nrmp.K
    fa = jnp.asarray(rng.normal(size=(B, T, K, 2)) * 0.3, jnp.float32)
    fb = jnp.asarray(rng.normal(size=(B, T, K)) - 1.0, jnp.float32)

    @jax.jit
    def qp_only(nom_s, nom_u, ref_s, ref_us, fa, fb):
        with jax.default_matmul_precision("highest"):
            def one(nom_s, nom_u, ref_s, ref_us, fa, fb):
                A_dyn, B_dyn, C_dyn = spec.robot.linearize(nom_s, nom_u)
                qp = build_qp(spec.nrmp, adjust, nom_s, nom_u, ref_s, ref_us,
                              A_dyn, B_dyn, C_dyn, fa, fb)
                return solve_qp(qp, spec.admm).x
            return jax.vmap(one)(nom_s, nom_u, ref_s, ref_us, fa, fb)

    t_qp = timeit(qp_only, nom_s, nom_u, ref_s, ref_us, fa, fb)
    print(f"qp assemble+solve (1 iter, B={B}): {t_qp*1e3:.1f} ms", flush=True)

    # QP without polish
    import dataclasses
    spec_np = dataclasses.replace(spec, admm=dataclasses.replace(spec.admm, polish=False))

    @jax.jit
    def qp_nopolish(nom_s, nom_u, ref_s, ref_us, fa, fb):
        with jax.default_matmul_precision("highest"):
            def one(nom_s, nom_u, ref_s, ref_us, fa, fb):
                A_dyn, B_dyn, C_dyn = spec.robot.linearize(nom_s, nom_u)
                qp = build_qp(spec.nrmp, adjust, nom_s, nom_u, ref_s, ref_us,
                              A_dyn, B_dyn, C_dyn, fa, fb)
                return solve_qp(qp, spec_np.admm).x
            return jax.vmap(one)(nom_s, nom_u, ref_s, ref_us, fa, fb)

    t_qp_np = timeit(qp_nopolish, nom_s, nom_u, ref_s, ref_us, fa, fb)
    print(f"qp no-polish (1 iter, B={B}): {t_qp_np*1e3:.1f} ms", flush=True)

    # ADMM iteration count sweep
    for iters in (100, 200):
        spec_i = dataclasses.replace(spec.admm, iters=iters)

        @jax.jit
        def qp_i(nom_s, nom_u, ref_s, ref_us, fa, fb):
            with jax.default_matmul_precision("highest"):
                def one(nom_s, nom_u, ref_s, ref_us, fa, fb):
                    A_dyn, B_dyn, C_dyn = spec.robot.linearize(nom_s, nom_u)
                    qp = build_qp(spec.nrmp, adjust, nom_s, nom_u, ref_s, ref_us,
                                  A_dyn, B_dyn, C_dyn, fa, fb)
                    return solve_qp(qp, spec_i).x
                return jax.vmap(one)(nom_s, nom_u, ref_s, ref_us, fa, fb)

        t = timeit(qp_i, nom_s, nom_u, ref_s, ref_us, fa, fb)
        print(f"qp iters={iters} (1 iter, B={B}): {t*1e3:.1f} ms", flush=True)

    # --- full step ----------------------------------------------------
    step = jax.jit(lambda *a: batched_planner_step(spec, params, G, h, adjust, *a))
    state = batched_init_state(spec, B)
    t_full = timeit(step, nom_s, nom_u, ref_s, ref_us, pts, vels, mask, state)
    print(f"full step (2 PAN iters, B={B}): {t_full*1e3:.1f} ms "
          f"=> {B/t_full:.0f} solves/s", flush=True)


if __name__ == "__main__":
    main(int(os.environ.get("BENCH_BATCH", "256")))
