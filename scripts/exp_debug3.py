import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
if "--dev8" in sys.argv:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import numpy as np, jax, jax.numpy as jnp
from neupan_tpu.models import obs_point_net
from neupan_tpu.ops.dune import dune_forward, generate_point_flow

G = jnp.asarray([[0.0,-1.0],[1.0,0.0],[0.0,1.0],[-1.0,0.0]])
h = jnp.asarray([[0.5]]*4)
params = obs_point_net.init_params(jax.random.PRNGKey(1), 2, 4)
nom_s = jnp.asarray(np.random.default_rng(1).normal(size=(3,2)), jnp.float32)
pts = jnp.asarray([[2.0,3.0],[1.0,-1.0]], jnp.float32)
mask = jnp.asarray([True, True])
pf, R, glob = generate_point_flow(nom_s, pts, jnp.zeros_like(pts), 0.1)
out = dune_forward(params, G, h, pf, R, glob, mask, k=2)
mu = np.asarray(out.mu_k)
errs = []
for t in range(2):
    lam_expect = -np.asarray(R[t]) @ np.asarray(G).T @ mu[t]
    errs.append(np.abs(np.asarray(out.lam_k[t]) - lam_expect).max())
print(f"dev8={'--dev8' in sys.argv} lam errs: {errs}", flush=True)

from neupan_tpu.training.labels import polygon_distance_labels
from neupan_tpu.robot import Robot
r = Robot.create(kinematics="diff", length=1.6, width=2.0, max_speed=[8,1], max_acce=[8,3])
Gr, hr = jnp.asarray(r.G, jnp.float32), jnp.asarray(r.h, jnp.float32)
rng = np.random.default_rng(0)
p500 = rng.uniform(-5,5,(500,2)).astype(np.float32)
mu_g, d_g = polygon_distance_labels(Gr, hr, jnp.asarray(p500))
val = (np.asarray(mu_g) * (p500 @ np.asarray(Gr).T - np.asarray(hr).reshape(-1))).sum(1)
print("labels dual-value err:", np.abs(val - np.asarray(d_g)).max())
