"""Reg ladder: how far can reg_u/reg_d drop with both gates still PASS?

VERDICT round-4 #1.  The round-4 formulation-gap artifact showed the
|u0_shipped - u0_oracle(reg=0)| action deviation is carried ~entirely by
the regularization itself (pure formulation shift identical, face
diameter 5.5e-4).  The shift should scale ~linearly with reg, so a
small-reg config plausibly meets the p90 <= 1e-2 action gate (target
1e-3) — IF the solver still converges there (reg exists to make the
objective strictly convex for the value-based polish; reg -> 0 re-enters
the round-2 non-convergent regime).

For each rung this driver runs, via the NEUPAN_NRMP_JSON override:
  1. the optimality contract (scripts/exp_control_accuracy.py — obj gap
     <= 1e-4, viol <= 2e-3 vs f64 oracles of the REGULARIZED problem);
  2. the formulation gap (scripts/exp_formulation_gap.py — epsilon-
     optimality for the reg=0 REFERENCE objective + the action gate).

Writes BENCH_REG_LADDER.json.  The chosen config must additionally pass
the 26/26 scenario sweep before shipping (run separately — ~45 min).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNGS = [0.1, 0.03, 0.01, 3e-3, 1e-3]


def run_rung(reg):
    env = dict(os.environ)
    env["NEUPAN_NRMP_JSON"] = json.dumps({"reg_u": reg, "reg_d": reg})
    env["PYTHONPATH"] = REPO
    rec = {"reg": reg}

    print(f"=== rung reg={reg}: optimality contract ===", flush=True)
    p = subprocess.run([sys.executable, "scripts/exp_control_accuracy.py"],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=3600)
    tail = (p.stdout or "").strip().splitlines()[-12:]
    print("\n".join(tail), flush=True)
    rec["contract_pass"] = "\nPASS" in p.stdout or p.stdout.startswith("PASS")
    rec["contract_tail"] = [ln.strip() for ln in tail[-6:]]

    print(f"=== rung reg={reg}: formulation gap ===", flush=True)
    p = subprocess.run([sys.executable, "scripts/exp_formulation_gap.py"],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=7200)
    print("\n".join((p.stdout or "").strip().splitlines()[-8:]), flush=True)
    rec["gap_opt_pass"] = "PASS(optimality)" in p.stdout
    rec["gap_act_pass"] = "PASS(action)" in p.stdout
    gap_path = os.path.join(REPO, "BENCH_FORMULATION_GAP.json")
    if os.path.exists(gap_path):
        with open(gap_path) as f:
            g = json.load(f)
        rec["u0_p50"] = g["shipped_vs_ref_form_u0"]["p50"]
        rec["u0_p90"] = g["shipped_vs_ref_form_u0"]["p90"]
        rec["u0_max"] = g["shipped_vs_ref_form_u0"]["max"]
        rec["ref_obj_gap_max"] = g["ref_objective_gap_of_shipped"]["max"]
        rec["ref_viol_max"] = g["ref_hard_violation_of_shipped"]["max"]
        os.rename(gap_path, os.path.join(
            REPO, f"BENCH_FORMULATION_GAP_reg{reg:g}.json"))
    return rec


def main():
    rungs = [float(r) for r in
             os.environ.get("RUNGS", "").split(",") if r] or RUNGS
    out_path = os.path.join(REPO, "BENCH_REG_LADDER.json")
    results = []
    if os.path.exists(out_path) and os.environ.get("RESUME"):
        with open(out_path) as f:
            results = json.load(f)["rungs"]
        done = {r["reg"] for r in results}
        rungs = [r for r in rungs if r not in done]
    for reg in rungs:
        results.append(run_rung(reg))
        with open(out_path, "w") as f:
            json.dump({"metric": "reg_ladder", "rungs": results}, f, indent=1)
        print(f"wrote {out_path} ({len(results)} rungs)", flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
