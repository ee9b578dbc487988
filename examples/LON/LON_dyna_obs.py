"""LON tuning in a SECOND environment: dyna_obs/diff (moving obstacles).

VERDICT round-4 #7: the round-4 LON evidence was a single scenario/seed.
This runner applies the identical tuning + fixed-semantics evaluation
harness (LON_corridor.main) to the dyna_obs/diff scenario — RVO-driven
moving obstacles, so the near-collision loss is exercised by dynamic
geometry rather than a static squeeze.  Results artifact:
results_dyna_obs.txt.

Same knobs as LON_corridor (LON_EPOCHS / LON_COLL / LON_LR ...); the
collision-threshold default here is 0.85, NOT the corridor's 0.4: the
untuned dyna_obs/diff episode already passes with min clearance ~0.74,
so at 0.4 the loss is identically zero and there is nothing to tune
(recorded while writing this harness).  0.85 makes the near-miss steps
carry loss the tuner can trade against.
"""

import os

os.environ.setdefault("LON_SCENARIO", "dyna_obs/diff")
os.environ.setdefault("LON_COLL", "0.85")

from LON_corridor import main  # noqa: E402

if __name__ == "__main__":
    save = os.environ.get(
        "LON_SAVE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "results_dyna_obs.txt"))
    main(save_path=save)
