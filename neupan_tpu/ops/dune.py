"""DUNE — Deep Unfolded Neural Encoder, batched TPU compute path.

Re-design of the reference DUNE forward (reference: blocks/dune.py:58-127)
with fixed shapes: all T+1 horizon frames and all P_max (padded) obstacle
points are processed in one batched MLP evaluation, followed by vectorized
lambda/distance computation and a masked top-k per frame replacing the
reference's Python-level per-frame argsort.

Shapes (single scenario; vmap over a scenario axis for batches):
    point_flow : (T+1, 2, P)  obstacle points in each predicted robot frame
    R_all      : (T+1, 2, 2)  world-from-robot rotation per frame
    points_glob: (T+1, 2, P)  obstacle points in world frame (with velocity
                              advance applied per frame)
    mask       : (P,) bool    valid-point mask (padding = False)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from neupan_tpu.models import obs_point_net

_INF = 1e9


class DuneOutput(NamedTuple):
    mu_k: jnp.ndarray        # (T+1, E, K)  duals of K closest points, sorted
    lam_k: jnp.ndarray       # (T+1, 2, K)
    points_k: jnp.ndarray    # (T+1, 2, K)  world-frame coordinates
    dist_k: jnp.ndarray      # (T+1, K)     sorted ascending distances
    valid_k: jnp.ndarray     # (T+1, K) bool  which of the K slots are real
    min_distance: jnp.ndarray  # scalar: min distance at frame 0


def dune_forward(params, G: jnp.ndarray, h: jnp.ndarray,
                 point_flow: jnp.ndarray, R_all: jnp.ndarray,
                 points_glob: jnp.ndarray, mask: jnp.ndarray,
                 k: int) -> DuneOutput:
    """Map the point flow to latent distance-space duals, keeping top-k.

    mu = MLP(p0);  lam = -R G' mu;  d = mu'(G p0 - h)   (dune.py:78-127)
    The per-frame ascending-distance sort + truncation to ``k`` happens via
    lax.top_k on masked distances.
    """
    Tp1, _, P = point_flow.shape
    E = G.shape[0]

    pts = jnp.swapaxes(point_flow, 1, 2)          # (T+1, P, 2)
    mu = obs_point_net.forward(params, pts)        # (T+1, P, E)

    # lam = -R @ G^T @ mu   per frame/point
    RG = jnp.einsum("tab,eb->tae", R_all, G)       # (T+1, 2, E)
    lam = -jnp.einsum("tae,tpe->tap", RG, mu)      # (T+1, 2, P)

    # signed distance d = mu' (G p0 - h)
    Gp = jnp.einsum("eb,tbp->tep", G, point_flow) - h.reshape(1, E, 1)
    dist = jnp.einsum("tpe,tep->tp", mu, Gp)       # (T+1, P)

    masked_dist = jnp.where(mask[None, :], dist, _INF)
    min_distance = jnp.min(masked_dist[0])

    # top-k smallest distances per frame
    neg_top, idx = jax.lax.top_k(-masked_dist, k)  # (T+1, K)
    dist_k = -neg_top
    valid_k = dist_k < _INF * 0.5

    take = jax.vmap(lambda arr, i: arr[:, i])      # gather columns per frame
    mu_k = take(jnp.swapaxes(mu, 1, 2), idx)       # (T+1, E, K)
    lam_k = take(lam, idx)                         # (T+1, 2, K)
    points_k = take(points_glob, idx)              # (T+1, 2, K)

    return DuneOutput(mu_k, lam_k, points_k, dist_k, valid_k, min_distance)


def generate_point_flow(nom_s: jnp.ndarray, points: jnp.ndarray,
                        velocities: jnp.ndarray, dt: float):
    """Advance points by per-frame velocity and express them in robot frames.

    Vectorized equivalent of the reference point-flow loop
    (pan.py:150-212): frame i sees points + i*dt*velocity, transformed by
    p0 = R_i' (p - t_i).

    Args:
        nom_s: (3, T+1) nominal states.
        points: (2, P) world-frame obstacle points.
        velocities: (2, P) per-point velocity.
    Returns:
        point_flow (T+1, 2, P), R_all (T+1, 2, 2), points_glob (T+1, 2, P)
    """
    Tp1 = nom_s.shape[1]
    steps = jnp.arange(Tp1, dtype=points.dtype).reshape(Tp1, 1, 1)
    points_glob = points[None, :, :] + steps * (velocities[None, :, :] * dt)

    theta = nom_s[2, :]
    c, s = jnp.cos(theta), jnp.sin(theta)
    R_all = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=1
    )  # (T+1, 2, 2)
    trans = nom_s[0:2, :].T[:, :, None]            # (T+1, 2, 1)
    point_flow = jnp.einsum("tba,tbp->tap", R_all, points_glob - trans)
    return point_flow, R_all, points_glob
