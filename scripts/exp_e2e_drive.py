"""Experiment: end-to-end planner drive through the public API."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
from neupan_tpu.planner import NeuPan
from neupan_tpu.ipath import InitialPath

planner = NeuPan(
    receding=10, step_time=0.1, ref_speed=4.0,
    robot_kwargs=dict(kinematics="diff", max_speed=[8, 1], max_acce=[8, 3],
                      length=1.6, width=2.0),
    ipath_kwargs=dict(waypoints=[[0, 20, 0], [60, 20, 0]], curve_style="line"),
    pan_kwargs=dict(iter_num=2, dune_max_num=100, nrmp_max_num=10,
                    dune_checkpoint="/root/reference/example/model/diff_robot_default/model_5000.pth"),
    adjust_kwargs=dict(q_s=1.0, p_u=1.0, eta=15.0, d_max=1.0, d_min=0.1),
)
state = np.array([[-5.0], [20.0], [0.0]])
xs = np.linspace(-3, 10, 60)
points = np.vstack([xs, np.full_like(xs, 21.5)])

for i in range(5):
    action, info = planner(state, points)
    print(f"step {i}: action={np.round(action.ravel(),3)} min_dist={planner.min_distance:.3f} "
          f"stop={info['stop']}", flush=True)
    state = InitialPath.diff_model(state, action, 0.1)

action, info = planner(state, None)
print("no-points action:", np.round(action.ravel(), 3), flush=True)
action, info = planner(state, None)
print("no-points action 2:", np.round(action.ravel(), 3))
