import os
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import numpy as np, jax, jax.numpy as jnp

print("== lambda formula repro ==", flush=True)
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
for t in range(2):
    lam_expect = -np.asarray(R[t]) @ np.asarray(G).T @ mu[t]
    err = np.abs(np.asarray(out.lam_k[t]) - lam_expect).max()
    print(f"t={t} err={err:.2e}")
# recompute mu from pf directly
mu_direct = obs_point_net.forward(params, jnp.swapaxes(pf,1,2))
print("mu range:", np.asarray(mu_direct).min(), np.asarray(mu_direct).max())
# check gather consistency: recompute lam full then compare pre-gather
RG = jnp.einsum("tab,eb->tae", R, G)
lam_full = -jnp.einsum("tae,tpe->tap", RG, mu_direct)
lam_expect_full = np.stack([-np.asarray(R[t]) @ np.asarray(G).T @ np.asarray(mu_direct[t]).T for t in range(2)])
print("full lam err:", np.abs(np.asarray(lam_full)-lam_expect_full).max())

print("== labels vmap repro ==", flush=True)
from neupan_tpu.training.labels import polygon_distance_labels
from neupan_tpu.robot import Robot
r = Robot.create(kinematics="diff", length=1.6, width=2.0, max_speed=[8,1], max_acce=[8,3])
Gr, hr = jnp.asarray(r.G, jnp.float32), jnp.asarray(r.h, jnp.float32)
for batch in ([[3.0,0.0]], [[3.0,0.0],[3.0,0.0]], [[3.0,0.0],[0.5,4.0],[0.0,0.0]]):
    mu_g, d_g = polygon_distance_labels(Gr, hr, jnp.asarray(batch, jnp.float32))
    print(f"batch={len(batch)} mu_nonzero={bool(np.any(np.asarray(mu_g)!=0))} d={np.asarray(d_g)}")
