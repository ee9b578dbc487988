"""Train a DUNE model for the default Ackermann robot geometry (reference
parity: example/dune_train/dune_train_acker.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from neupan_tpu.planner import NeuPan

if __name__ == "__main__":
    planner = NeuPan.init_from_yaml(
        os.path.join(os.path.dirname(__file__), "dune_train_acker.yaml"))
    planner.train_dune()
