import os
os.environ["JAX_PLATFORMS"]="cpu"
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")
import numpy as np
import run_exp

base = "/root/repo/examples/corridor/diff"
res = run_exp.main(os.path.join(base, "env.yaml"), os.path.join(base, "planner.yaml"),
                   point_vel=False, max_steps=600, reverse=False, quiet=False)
print(res)
