"""Long-horizon (T=30) solver bake-off + qualification support.

VERDICT round-4 #5: the shipped condensed path at T=30 has a (90, 90)
normal matrix (above the XLA-GJ threshold) and no artifact measured
condensed-dense vs fullspace-banded there.  This experiment profiles, on
the real chip with device events:

  a. condensed ADMM, sweep-kernel inverse at n=90 (round-5 default);
  b. condensed ADMM with the batched cholesky inverse (what the round-4
     code would have done at T=30) — obtained by dropping _SWEEP_MAX_N;
  c. full-space ADMM with the block-tridiagonal (banded) inverse;
  d. full-space ADMM with the dense cholesky inverse.

Writes BENCH_T30.json.  The T=30 accuracy contract runs separately:
  SCENARIO=corridor_long/diff PYTHONPATH=/root/repo \
      python scripts/exp_control_accuracy.py
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import default_adjust, load_deployed_params, make_flagship
from neupan_tpu.ops.nrmp import build_qp, condensation
from neupan_tpu.ops import qp as qp_mod
from neupan_tpu.ops import banded as banded_mod
from scripts.prof_util import device_profile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(B=256, T=30):
    spec = make_flagship(T=T)
    nrmp = spec.nrmp
    adjust = default_adjust()
    rng = np.random.default_rng(0)
    K = nrmp.K

    nom_u = jnp.zeros((B, 2, T), jnp.float32)
    nom_s = jax.vmap(lambda s0, u: spec.robot.rollout(s0, u))(
        jnp.zeros((B, 3), jnp.float32), nom_u)
    ref_s = nom_s
    ref_us = jnp.ones((B, T), jnp.float32) * 4.0
    fa = jnp.asarray(rng.normal(size=(B, T, K, 2)) * 0.3, jnp.float32)
    fb = jnp.asarray(rng.normal(size=(B, T, K)) - 1.0, jnp.float32)

    n_acc = nrmp.r_spd - nrmp.r_acc
    base = dataclasses.replace(
        spec.admm, elim_n_eq=nrmp.r_acc, elim_n_hard=nrmp.r_obs - nrmp.r_acc,
        elim_n_acc=n_acc)
    perm = tuple(int(i) for i in banded_mod.nrmp_permutation(T))

    record = {"B": B, "T": T, "backend": jax.default_backend(),
              "basis": "profiler device time (ms/call)"}

    def qp_step_fn(cfg, use_elim=True):
        def one(a, b, c, d, e, f, x0):
            A_dyn, B_dyn, C_dyn = spec.robot.linearize(a, b)
            qp = build_qp(nrmp, adjust, a, b, c, d, A_dyn, B_dyn, C_dyn, e, f)
            elim = (condensation(nrmp, A_dyn, B_dyn, C_dyn, a[:, 0])
                    if use_elim else None)
            return qp_mod.solve_qp(qp, cfg, x0=x0, elim=elim).x

        def step(x0):
            x = jax.vmap(lambda a, b, c, d, e, f, x0_: one(
                a, b, c, d, e, f, x0_))(nom_s, nom_u, ref_s, ref_us, fa, fb,
                                        x0)
            return x * 0.999

        return jax.jit(step)

    x0 = jnp.zeros((B, nrmp.n), jnp.float32)
    variants = [
        ("condensed_sweep_ms", base, True, None),
        ("condensed_cholesky_ms", base, True, 36),   # drop the sweep range
        ("fullspace_banded_ms",
         dataclasses.replace(base, condense_admm=False, inverse="banded",
                             banded_perm=perm), True, None),
        ("fullspace_dense_ms",
         dataclasses.replace(base, condense_admm=False), True, None),
    ]
    for name, cfg, use_elim, sweep_cap in variants:
        old = qp_mod._SWEEP_MAX_N
        if sweep_cap is not None:
            qp_mod._SWEEP_MAX_N = sweep_cap
            qp_mod._condensed_loop.cache_clear()
        try:
            t, _ = device_profile(qp_step_fn(cfg, use_elim), x0, n=6)
        finally:
            qp_mod._SWEEP_MAX_N = old
            qp_mod._condensed_loop.cache_clear()
        record[name] = round(t, 4)
        print(f"{name}: {t:.4f} ms/call", flush=True)

    ranked = sorted(v for v in record.items()
                    if isinstance(v[1], float) and v[0].endswith("_ms"))
    record["winner"] = min(
        (v for v in record.items() if str(v[0]).endswith("_ms")),
        key=lambda kv: kv[1])[0]
    out = os.path.join(REPO, "BENCH_T30.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main(int(os.environ.get("BENCH_BATCH", "256")))
