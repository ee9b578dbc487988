"""LON tuning in a SECOND environment: dyna_obs/diff (moving obstacles).

VERDICT round-4 #7: the round-4 LON evidence was a single scenario/seed.
This runner applies the identical tuning + fixed-semantics evaluation
harness (LON_corridor.main) to the dyna_obs/diff scenario — RVO-driven
moving obstacles, so the near-collision loss is exercised by dynamic
geometry rather than a static squeeze.  Results artifact:
results_dyna_obs.txt.

Same knobs as LON_corridor (LON_EPOCHS / LON_COLL / LON_LR ...); the
collision threshold default stays 0.4 — dyna_obs clearances pass well
above it, so the zero-basin pathology documented in LON_corridor does not
bind here.
"""

import os

os.environ.setdefault("LON_SCENARIO", "dyna_obs/diff")

from LON_corridor import main  # noqa: E402

if __name__ == "__main__":
    save = os.environ.get(
        "LON_SAVE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "results_dyna_obs.txt"))
    main(save_path=save)
