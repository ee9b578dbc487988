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

from typing import NamedTuple, Optional

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


def signed_polygon_distance(vertices: jnp.ndarray, G: jnp.ndarray,
                            h: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Exact signed Euclidean distance from points to a convex polygon.

    The DUNE encoder is *trained* to reproduce exactly this quantity (the
    optimum of the dual distance problem max mu'(Gp - h) s.t. ||G'mu|| <= 1,
    reference dune_train.py:85-99), so the closed form is the ground truth
    the learned d approximates.  Outside points: min distance over the edge
    segments; inside points: the (negative) largest normalized face margin.

    Args:
        vertices: (2, V) polygon vertices, CCW.
        G, h: half-space description G x <= h, rows matching the edges.
        points: (..., 2, P).
    Returns:
        (..., P) signed distances (negative inside).
    """
    v0 = vertices                                    # (2, V)
    v1 = jnp.roll(vertices, -1, axis=1)              # (2, V)
    e = v1 - v0                                      # (2, V)
    ee = jnp.maximum(jnp.sum(e * e, axis=0), 1e-12)  # (V,)

    pv = points[..., :, None, :] - v0[:, :, None]    # (..., 2, V, P)
    t = jnp.clip(jnp.sum(pv * e[:, :, None], axis=-3) / ee[:, None], 0.0, 1.0)
    # distance point -> segment
    diff = pv - e[:, :, None] * t[..., None, :, :]   # (..., 2, V, P)
    d_out = jnp.sqrt(jnp.min(jnp.sum(diff * diff, axis=-3), axis=-2) + 1e-30)

    g_norm = jnp.sqrt(jnp.sum(G * G, axis=1))        # (E,)
    marg = (jnp.einsum("eb,...bp->...ep", G, points)
            - h.reshape(-1)[:, None]) / g_norm[:, None]
    d_in = jnp.max(marg, axis=-2)                    # (..., P), <= 0 inside
    return jnp.where(d_in <= 0.0, d_in, d_out)


def dune_forward(params, G: jnp.ndarray, h: jnp.ndarray,
                 point_flow: jnp.ndarray, R_all: jnp.ndarray,
                 points_glob: jnp.ndarray, mask: jnp.ndarray,
                 k: int, use_pallas: bool = False, select: str = "mlp",
                 vertices: Optional[jnp.ndarray] = None,
                 mlp_pallas: Optional[bool] = None) -> DuneOutput:
    """Map the point flow to latent distance-space duals, keeping top-k.

    mu = MLP(p0);  lam = -R G' mu;  d = mu'(G p0 - h)   (dune.py:78-127)
    The per-frame ascending-distance sort + truncation to ``k`` happens via
    lax.top_k on masked distances.

    ``select`` picks the ranking used for the top-k:
      * "mlp" (reference parity): rank by the learned d — the MLP runs on
        every point, O(N) MLP work.
      * "exact": rank by the closed-form signed polygon distance (requires
        ``vertices``), then run the MLP only on the k winners per frame —
        O(N*E) VPU work + O(k) MLP work.  A trained encoder matches the
        exact distance to ~1e-4, so the selections differ only on genuine
        near-ties; the returned mu/lam/dist are still the learned ones on
        the selected points (NRMP parity preserved).

    ``use_pallas`` routes the top-k SELECTION through the fused Pallas
    distance-rank kernel (ops/pallas/select.py; measured 3x faster than
    XLA and exactly faithful to the f64 ordering).  ``mlp_pallas``
    separately routes the MLP through the fused Pallas kernel
    (ops/pallas/mlp.py); None inherits ``use_pallas`` for backward
    compatibility — PANSpec.use_dune_mlp_pallas() decides the shipped
    value from measurement (scripts/exp_mlp_ab.py).
    """
    Tp1, _, P = point_flow.shape
    E = G.shape[0]
    if mlp_pallas is None:
        mlp_pallas = use_pallas

    def run_mlp(pts_batch):
        if mlp_pallas:
            from neupan_tpu.ops.pallas.mlp import dune_mlp_pallas

            flat = pts_batch.reshape(-1, 2)
            return dune_mlp_pallas(params, flat).reshape(
                *pts_batch.shape[:-1], E)
        return obs_point_net.forward(params, pts_batch)

    take = jax.vmap(lambda arr, i: arr[:, i])      # gather columns per frame

    if select == "exact":
        if vertices is None:
            raise ValueError('select="exact" requires polygon vertices')
        if use_pallas:
            # fused distance-rank + top-k kernel: 3x faster than the XLA
            # path at planner batch sizes AND exactly faithful to the f64
            # distance ordering (the XLA path's f32 sqrt introduces ties);
            # see ops/pallas/select.py.
            from neupan_tpu.ops.pallas.select import select_topk_pallas

            # The selection INDICES are piecewise-constant in every input,
            # so the kernel is evaluated under stop_gradient (Pallas calls
            # have no linearization rule; LON differentiates through
            # pan_forward).  Gradients flow through the differentiable
            # gathers below, exactly as for the XLA top_k path.
            keys_k, idx = select_topk_pallas(
                jax.lax.stop_gradient(point_flow), mask, vertices, G, h, k)
            valid_k = keys_k < _INF * 0.5
        else:
            d_sel = signed_polygon_distance(vertices, G, h, point_flow)
            masked_sel = jnp.where(mask[None, :], d_sel, _INF)
            _, idx = jax.lax.top_k(-masked_sel, k)  # (T+1, K)
            valid_k = take(masked_sel[:, None, :], idx)[:, 0, :] < _INF * 0.5

        pf_k = take(point_flow, idx)               # (T+1, 2, K)
        mu_tk = run_mlp(jnp.swapaxes(pf_k, 1, 2))  # (T+1, K, E)

        RG = jnp.einsum("tab,eb->tae", R_all, G)   # (T+1, 2, E)
        lam_k = -jnp.einsum("tae,tke->tak", RG, mu_tk)
        Gp_k = jnp.einsum("eb,tbk->tek", G, pf_k) - h.reshape(1, E, 1)
        dist_k = jnp.einsum("tke,tek->tk", mu_tk, Gp_k)
        dist_k = jnp.where(valid_k, dist_k, _INF)

        # keep the ascending-by-learned-distance slot order (reference
        # dune.py:100-104); k is tiny so the per-frame sort is negligible
        order = jnp.argsort(dist_k, axis=1)
        dist_k = jnp.take_along_axis(dist_k, order, axis=1)
        valid_k = jnp.take_along_axis(valid_k, order, axis=1)
        mu_k = jnp.take_along_axis(
            jnp.swapaxes(mu_tk, 1, 2), order[:, None, :], axis=2)
        lam_k = jnp.take_along_axis(lam_k, order[:, None, :], axis=2)
        idx_s = jnp.take_along_axis(idx, order, axis=1)
        points_k = take(points_glob, idx_s)        # (T+1, 2, K)

        min_distance = jnp.min(dist_k[0])
        return DuneOutput(mu_k, lam_k, points_k, dist_k, valid_k, min_distance)

    pts = jnp.swapaxes(point_flow, 1, 2)          # (T+1, P, 2)
    mu = run_mlp(pts)                              # (T+1, P, E)

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

    mu_k = take(jnp.swapaxes(mu, 1, 2), idx)       # (T+1, E, K)
    lam_k = take(lam, idx)                         # (T+1, 2, K)
    points_k = take(points_glob, idx)              # (T+1, 2, K)

    return DuneOutput(mu_k, lam_k, points_k, dist_k, valid_k, min_distance)


def frame_transforms(nom_s: jnp.ndarray):
    """Per-frame world-from-robot rotations + translations from nominal
    states: R_all (T+1, 2, 2), trans (T+1, 2)."""
    theta = nom_s[2, :]
    c, s = jnp.cos(theta), jnp.sin(theta)
    R_all = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=1
    )  # (T+1, 2, 2)
    return R_all, nom_s[0:2, :].T


def dune_forward_flow(params, G: jnp.ndarray, h: jnp.ndarray,
                      points: jnp.ndarray, velocities: jnp.ndarray,
                      mask: jnp.ndarray, nom_s: jnp.ndarray, dt: float,
                      k: int, vertices: jnp.ndarray,
                      mlp_pallas: bool = False) -> DuneOutput:
    """Fused exact-selection DUNE forward: point flow generated in-kernel.

    Equivalent to generate_point_flow + dune_forward(select="exact",
    use_pallas=True) but never materializes the (T+1, 2, P) per-frame
    point expansions — at the flagship shapes those are two ~92 MB HBM
    arrays per PAN iteration whose writes+reads dominated the DUNE stage
    (round-5 profile).  The Pallas selection kernel expands each frame's
    coordinates in registers (ops/pallas/select.py:_select_flow_kernel);
    only the K winners per frame are ever expanded in HBM.
    """
    from neupan_tpu.ops.pallas.select import select_topk_flow_pallas

    Tp1 = nom_s.shape[1]
    E = G.shape[0]
    R_all, trans = frame_transforms(nom_s)

    # selection indices are piecewise-constant in every input (kernel has
    # no linearization rule); downstream winner math is differentiable
    keys_k, idx = select_topk_flow_pallas(
        jax.lax.stop_gradient(points), jax.lax.stop_gradient(velocities),
        mask, jax.lax.stop_gradient(R_all), jax.lax.stop_gradient(trans),
        dt, vertices, G, h, k)
    valid_k = keys_k < _INF * 0.5

    # winners only: world-frame advance + robot-frame transform (T+1, 2, K).
    # ONE fused gather for points+velocities (two separate fancy gathers
    # measured ~0.8 ms each at B=512 — TPU gathers pay per row, so halve
    # the row count by stacking the four coordinate channels)
    pv = jnp.concatenate([points, velocities], axis=0)   # (4, P)
    pvw = pv[:, idx]                                     # (4, T+1, K)
    ptsw, velw = pvw[:2], pvw[2:]
    steps = jnp.arange(Tp1, dtype=points.dtype) * dt
    p_glob_k = jnp.swapaxes(ptsw + steps[None, :, None] * velw, 0, 1)
    pf_k = jnp.einsum("tba,tbk->tak", R_all, p_glob_k - trans[:, :, None])

    if mlp_pallas:
        from neupan_tpu.ops.pallas.mlp import dune_mlp_pallas
        mu_tk = dune_mlp_pallas(params, pf_k.swapaxes(1, 2).reshape(-1, 2)
                                ).reshape(Tp1, k, E)
    else:
        mu_tk = obs_point_net.forward(params, jnp.swapaxes(pf_k, 1, 2))

    RG = jnp.einsum("tab,eb->tae", R_all, G)    # (T+1, 2, E)
    lam_k = -jnp.einsum("tae,tke->tak", RG, mu_tk)
    Gp_k = jnp.einsum("eb,tbk->tek", G, pf_k) - h.reshape(1, E, 1)
    dist_k = jnp.einsum("tke,tek->tk", mu_tk, Gp_k)
    dist_k = jnp.where(valid_k, dist_k, _INF)

    # Slot order: the selection kernel already returns slots ascending by
    # the EXACT distance; the materialized path re-sorts by the learned
    # distance (reference dune.py:100-104), which differs only on learned-
    # vs-exact near-ties (~1e-4 for a trained encoder).  The NRMP problem
    # is invariant to slot order (all K soft rows are symmetric) and the
    # invalid-slot replication uses slot 0 = the closest point either way,
    # so the fused path SKIPS the re-sort — it measured ~3.5 ms/step of
    # tiny per-frame sorts + gathers at B=512 (round-5 profile).
    min_distance = jnp.min(dist_k[0])
    mu_k = jnp.swapaxes(mu_tk, 1, 2)
    return DuneOutput(mu_k, lam_k, p_glob_k, dist_k, valid_k, min_distance)


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
