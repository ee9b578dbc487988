"""LON variant 01: same tuning loop as LON_corridor.py, started from the
pre-tuned adjust parameters in planner_01.yaml (reference:
example/LON/LON_corridor_01.py — differs from the base script only in the
planner config it loads).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("NEUPAN_PLATFORM", "cpu")  # hard-set: ambient axon otherwise leaks in (docs/AXON_DISPATCH.md)
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from LON.LON_corridor import run_episode  # noqa: E402
from neupan_tpu.lon import LONTuner  # noqa: E402
from neupan_tpu.planner import NeuPan  # noqa: E402

EPOCHS = int(os.environ.get("LON_EPOCHS", "3"))

if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    planner = NeuPan.init_from_yaml(os.path.join(here, "planner_01.yaml"))
    # LON owns the stuck behavior through its loss (reference
    # example/LON/LON_corridor.py:10-19); the planner's built-in deadlock
    # escape would fight the tuner (its temporary eta/d_max boost leaks
    # into the recorded trajectories), so it is off during tuning.
    planner.stuck_enabled = False
    tuner = LONTuner(planner.adjust, lr=5e-3)
    base = os.path.join(REPO, "examples", "corridor", "diff")

    save = os.environ.get("LON_SAVE")
    for epoch in range(EPOCHS):
        losses, min_dists = run_episode(planner, tuner, base)
        adj = planner.adjust
        line = (f"epoch {epoch}: steps={len(losses)} "
                f"episode_loss={np.sum(losses) if losses else 0:.3f} "
                f"min_dist={np.min(min_dists) if min_dists else float('inf'):.3f} "
                f"p_u={float(adj.p_u):.4f} eta={float(adj.eta):.4f} "
                f"d_max={float(adj.d_max):.4f}")
        print(line, flush=True)
        if save:
            with open(save, "a") as f:
                print(line, file=f)
