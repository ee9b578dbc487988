"""LON variant 01: same tuning loop as LON_corridor.py, started from the
pre-tuned adjust parameters in planner_01.yaml (reference:
example/LON/LON_corridor_01.py — differs from the base script only in the
planner config it loads).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
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
    tuner = LONTuner(planner.adjust, lr=5e-3)
    base = os.path.join(REPO, "examples", "corridor", "diff")

    for epoch in range(EPOCHS):
        losses = run_episode(planner, tuner, base)
        adj = planner.adjust
        print(f"epoch {epoch}: steps={len(losses)} "
              f"mean_loss={np.mean(losses) if losses else 0:.3f} "
              f"p_u={float(adj.p_u):.3f} eta={float(adj.eta):.3f} "
              f"d_max={float(adj.d_max):.3f}")
