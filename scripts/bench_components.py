"""Component-level TPU benchmark: DUNE vs QP vs full step.

Writes BENCH_COMPONENTS.json: per-stage DEVICE times at the deployed
config so optimization work aims at the dominant piece.  Analysis summary
lives in BASELINE.md.

Round-4 methodology: all timings come from the jax profiler's device-side
event stream (scripts/prof_util.device_profile) with chained inputs —
wall-clock timings on the axon tunnel are enqueue-ACK fiction in the
healthy dispatch mode (docs/AXON_DISPATCH.md); the round-3 version of this
artifact was recorded in the capture-degraded RPC mode and mixed device
time with tunnel overhead.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import default_adjust, load_deployed_params, make_batch, make_flagship
from neupan_tpu.ops.dune import dune_forward, generate_point_flow
from neupan_tpu.ops.nrmp import AdjustParams, build_qp, condensation
from neupan_tpu.ops import qp as qp_mod
from neupan_tpu.parallel import batched_init_state, batched_planner_step
from scripts.prof_util import device_profile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(B=256):
    record = {"B": B, "backend": jax.default_backend(),
              "basis": "profiler device time (ms/call)"}
    spec = make_flagship()
    P = spec.dune_max_num
    G = jnp.asarray(spec.robot.G, jnp.float32)
    h = jnp.asarray(spec.robot.h, jnp.float32)
    params = load_deployed_params(spec)
    adjust = default_adjust()
    nom_s, nom_u, ref_s, ref_us, pts, vels, mask = make_batch(spec, B)

    def rec(key, t, note=""):
        record[key] = round(t, 4)
        print(f"{key}: {t:.4f} ms {note}", flush=True)

    # --- DUNE (one PAN iteration worth), spec-default path -------------
    vertices = (np.asarray(spec.robot.vertices, np.float32)
                if spec.dune_select == "exact" else None)
    use_pallas = spec.use_dune_pallas()

    def dune_step(carry):
        key, nom_s, vels, mask = carry
        key, sub = jax.random.split(key)
        pts = jax.random.uniform(sub, (B, 2, P), jnp.float32, 1.0, 9.0)
        with jax.default_matmul_precision("highest"):
            def one(nom_s, pts, vels, mask):
                pf, R, glob = generate_point_flow(nom_s, pts, vels,
                                                  spec.robot.dt)
                return dune_forward(
                    params, G, h, pf, R, glob, mask, spec.nrmp.K,
                    use_pallas=use_pallas, select=spec.dune_select,
                    vertices=None if vertices is None
                    else jnp.asarray(vertices),
                    mlp_pallas=spec.use_dune_mlp_pallas())
            out = jax.vmap(one)(nom_s, pts, vels, mask)
        # chain: fold the output back into nom_s so calls depend on
        # each other (defeats enqueue/dedup games)
        nom_s = nom_s + 1e-6 * jnp.mean(out.mu_k)
        return (key, nom_s, vels, mask)

    t, _ = device_profile(jax.jit(dune_step),
                          (jax.random.PRNGKey(0), nom_s, vels, mask), n=8)
    rec("dune_ms", t,
        f"({spec.dune_select}{'+pallas' if use_pallas else ''}, 1 PAN iter)")

    # --- QP assembly + solve (one PAN iteration worth, deployed path) --
    rng = np.random.default_rng(0)
    T, K = spec.nrmp.T, spec.nrmp.K
    fa = jnp.asarray(rng.normal(size=(B, T, K, 2)) * 0.3, jnp.float32)
    fb = jnp.asarray(rng.normal(size=(B, T, K)) - 1.0, jnp.float32)
    n_acc = spec.nrmp.r_spd - spec.nrmp.r_acc
    base = dataclasses.replace(spec.admm, elim_n_eq=spec.nrmp.r_acc,
                               elim_n_hard=spec.nrmp.r_obs - spec.nrmp.r_acc,
                               elim_n_acc=n_acc)

    def qp_step_fn(cfg):
        def one(adjust, nom_s, nom_u, ref_s, ref_us, fa, fb, x0):
            A_dyn, B_dyn, C_dyn = spec.robot.linearize(nom_s, nom_u)
            qp = build_qp(spec.nrmp, adjust, nom_s, nom_u, ref_s, ref_us,
                          A_dyn, B_dyn, C_dyn, fa, fb)
            elim = condensation(spec.nrmp, A_dyn, B_dyn, C_dyn, nom_s[:, 0])
            return qp_mod.solve_qp(qp, cfg, x0=x0, elim=elim).x

        def step(carry):
            x0 = carry
            x = jax.vmap(lambda a, b, c, d, e, f, x0_: one(
                adjust, a, b, c, d, e, f, x0_))(
                nom_s, nom_u, ref_s, ref_us, fa, fb, x0)
            return x * 0.999          # chain

        return jax.jit(step)

    x0 = jnp.zeros((B, spec.nrmp.n), jnp.float32)
    for key_, cfg in (
        ("qp_full_ms", base),
        ("qp_no_polish_ms", dataclasses.replace(base, polish=False)),
        ("qp_iters300_ms", dataclasses.replace(base, iters=300)),
        ("qp_rounds2_ms", dataclasses.replace(base, polish_rounds=2)),
        ("qp_dense_fullspace_ms",
         dataclasses.replace(base, condense_admm=False, elim_n_acc=None)),
    ):
        t, _ = device_profile(qp_step_fn(cfg), x0, n=8)
        note = ""
        if key_ == "qp_full_ms":
            note = f"(assemble+admm{cfg.iters}+box-elim polish{cfg.polish_rounds})"
        if key_ == "qp_dense_fullspace_ms":
            note = "(round-3 full-space solver, for comparison)"
        rec(key_, t, note)

    # --- full step ----------------------------------------------------
    def full_step(carry):
        key, state = carry
        key, sub = jax.random.split(key)
        p = jax.random.uniform(sub, (B, 2, P), jnp.float32, 1.0, 9.0)
        out = batched_planner_step(spec, params, G, h, adjust, nom_s, nom_u,
                                   ref_s, ref_us, p, vels, mask, state)
        return (key, out.state)

    state = batched_init_state(spec, B)
    t, _ = device_profile(jax.jit(full_step),
                          (jax.random.PRNGKey(0), state), n=8)
    rec("full_step_ms", t, f"(2 PAN iters) => {B / t * 1e3:.0f} solves/s")
    record["solves_per_s"] = round(B / t * 1e3, 1)

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
