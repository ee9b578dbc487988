"""Component-level TPU benchmark: DUNE vs QP vs full step.

Writes BENCH_COMPONENTS.json (the VERDICT round-2 #3 artifact): per-stage
wall times at the deployed config so optimization work aims at the
dominant piece.  Analysis summary lives in BASELINE.md.
"""
import dataclasses
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
from neupan_tpu.ops.nrmp import AdjustParams, build_qp, condensation
from neupan_tpu.ops import qp as qp_mod
from neupan_tpu.parallel import batched_init_state, batched_planner_step

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(B=256):
    record = {"B": B, "backend": jax.default_backend()}
    spec = make_flagship()
    G = jnp.asarray(spec.robot.G, jnp.float32)
    h = jnp.asarray(spec.robot.h, jnp.float32)
    params = obs_point_net.init_params(jax.random.PRNGKey(0), 2,
                                       spec.robot.edge_dim)
    adjust = AdjustParams(q_s=jnp.asarray(1.0), p_u=jnp.asarray(1.0),
                          eta=jnp.asarray(10.0), d_max=jnp.asarray(1.0),
                          d_min=jnp.asarray(0.1))
    nom_s, nom_u, ref_s, ref_us, pts, vels, mask = make_batch(spec, B)

    def rec(key, t, note=""):
        record[key] = round(t * 1e3, 2)
        print(f"{key}: {t*1e3:.1f} ms {note}", flush=True)

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

    rec("dune_ms", timeit(dune_only, nom_s, pts, vels, mask),
        f"({spec.dune_select}{'+pallas' if use_pallas else ''}, 1 PAN iter)")

    # --- QP assembly + solve (one PAN iteration worth, deployed path) --
    rng = np.random.default_rng(0)
    T, K = spec.nrmp.T, spec.nrmp.K
    fa = jnp.asarray(rng.normal(size=(B, T, K, 2)) * 0.3, jnp.float32)
    fb = jnp.asarray(rng.normal(size=(B, T, K)) - 1.0, jnp.float32)
    base = dataclasses.replace(spec.admm, elim_n_eq=spec.nrmp.r_acc,
                               elim_n_hard=spec.nrmp.r_obs - spec.nrmp.r_acc)

    def qp_fn(cfg):
        def one(nom_s, nom_u, ref_s, ref_us, fa, fb):
            A_dyn, B_dyn, C_dyn = spec.robot.linearize(nom_s, nom_u)
            qp = build_qp(spec.nrmp, adjust, nom_s, nom_u, ref_s, ref_us,
                          A_dyn, B_dyn, C_dyn, fa, fb)
            elim = condensation(spec.nrmp, A_dyn, B_dyn, C_dyn, nom_s[:, 0])
            return qp_mod.solve_qp(qp, cfg, elim=elim).x
        return jax.jit(lambda *a: jax.vmap(one)(*a))

    args = (nom_s, nom_u, ref_s, ref_us, fa, fb)
    rec("qp_full_ms", timeit(qp_fn(base), *args),
        f"(assemble+admm{base.iters}+polish{base.polish_rounds})")
    rec("qp_no_polish_ms",
        timeit(qp_fn(dataclasses.replace(base, polish=False)), *args))
    for it in (100, 300):
        rec(f"qp_iters{it}_ms",
            timeit(qp_fn(dataclasses.replace(base, iters=it)), *args))
    rec("qp_rounds2_ms",
        timeit(qp_fn(dataclasses.replace(base, polish_rounds=2)), *args))

    # --- full step ----------------------------------------------------
    step = jax.jit(lambda *a: batched_planner_step(spec, params, G, h, adjust, *a))
    state = batched_init_state(spec, B)
    t_full = timeit(step, nom_s, nom_u, ref_s, ref_us, pts, vels, mask, state)
    rec("full_step_ms", t_full,
        f"(2 PAN iters) => {B/t_full:.0f} solves/s")
    record["solves_per_s"] = round(B / t_full, 1)

    # merge the banded crossover artifact when present
    banded_path = os.path.join(REPO, "BENCH_BANDED.json")
    if os.path.exists(banded_path):
        with open(banded_path) as f:
            record["banded_crossover"] = json.load(f)

    out = os.path.join(REPO, "BENCH_COMPONENTS.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(int(os.environ.get("BENCH_BATCH", "256")))
