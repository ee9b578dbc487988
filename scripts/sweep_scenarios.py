"""Closed-loop sweep over every shipped scenario config.

The integration oracle of the whole stack (SURVEY.md §4: the reference uses
its scenario examples as integration tests): each env+planner pair must
arrive without a latched collision.  Writes JSON results and exits nonzero
on any failure.

Usage: PYTHONPATH=/root/repo python scripts/sweep_scenarios.py [max_steps]
"""

import glob
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import run_exp  # noqa: E402


def main(max_steps=700):
    results = {}
    for pf in sorted(glob.glob(os.path.join(REPO, "examples/*/*/planner.yaml"))):
        d = os.path.dirname(pf)
        scen, kin = d.split(os.sep)[-2:]
        t0 = time.time()
        pv = scen.startswith("dyna")             # dynamic scenes use -v
        rev = scen == "reverse" and kin == "diff"
        try:
            r = run_exp.main(os.path.join(d, "env.yaml"), pf, point_vel=pv,
                             max_steps=max_steps, reverse=rev, quiet=True)
            r["wall_s"] = round(time.time() - t0, 1)
        except Exception as e:  # pragma: no cover - diagnostic path
            r = {"error": repr(e)[:200]}
        results[f"{scen}/{kin}"] = r
        print(f"{scen}/{kin}: {r}", flush=True)

    ok = sum(1 for r in results.values() if r.get("arrived") and not r.get("collided"))
    print(f"\n{ok}/{len(results)} scenarios arrived without collision")

    # Contact-step gate (round-3, advisor finding): arrival alone hides
    # safety-adjacent regressions.  Round 4: contacts must be ZERO in
    # EVERY scenario — with real ORCA obstacle behavior (sim.Behavior,
    # replacing the round-3 repulsion stand-in) the dynamic agents avoid
    # the robot properly and the round-2/3 dyna_non_obs/omni allowance
    # (47 contact steps of wandering agents driving into the robot) is no
    # longer needed: the round-4 sweep measured 0 contacts across all 25.
    CONTACT_ALLOWANCE = {}
    contact_ok = True
    for k, r in results.items():
        c = r.get("contacts", 0)
        if c > CONTACT_ALLOWANCE.get(k, 0):
            print(f"CONTACT GATE FAIL: {k} has {c} contact steps "
                  f"(allowed {CONTACT_ALLOWANCE.get(k, 0)})")
            contact_ok = False
    if contact_ok:
        print("contact gate: PASS")

    out = os.path.join(REPO, "sweep_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    return 0 if (ok == len(results) and contact_ok) else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 700))
