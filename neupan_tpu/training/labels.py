"""Ground-truth label generation for DUNE training.

The reference labels each random point with an ECOS solve of

    max_mu  mu' (G p - h)   s.t.  ||G' mu|| <= 1,  mu >= 0        (problem 10)

(reference: blocks/dune_train.py:85-140 — 100k sequential conic solves,
the dominant cost of its 1-2 h training run).  That program is the dual of
Euclidean projection onto the polygon {x : G x <= h}; its optimum is

    d*(p) = max(0, dist(p, polygon)),

and mu* is supported on the active faces of the projection.  We exploit this
closed form: labels are computed exactly, vectorized over all points at once
(``polygon_distance_labels``).  A batched projected-gradient-ascent solver of
the same dual (``dual_ascent_labels``) provides an independent numerical
cross-check and covers non-polytope uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def polygon_distance_labels(G: jnp.ndarray, h: jnp.ndarray, points: jnp.ndarray):
    """Exact (mu*, d*) for a batch of points.

    Args:
        G: (E, 2), h: (E, 1) half-space description (CCW polygon).
        points: (N, 2).
    Returns:
        mu: (N, E) optimal duals, d: (N,) optimal values.
    """
    # Callers may pass numpy G/h (kept numpy for jit-closure hygiene,
    # docs/AXON_DISPATCH.md); coerce here so tracer indexing works.
    G = jnp.asarray(G)
    E = G.shape[0]
    hv = jnp.asarray(h).reshape(-1)

    # polygon vertices: intersection of consecutive edges i, i+1
    def edge_vertex(i, j):
        A = jnp.stack([G[i], G[j]])
        b = jnp.stack([hv[i], hv[j]])
        return jnp.linalg.solve(A, b)

    idx = jnp.arange(E)
    verts = jax.vmap(edge_vertex)(idx, (idx + 1) % E)       # (E, 2) v_i = edge i ∩ edge i+1
    starts = jnp.roll(verts, 1, axis=0)                      # edge i spans starts[i] -> verts[i]

    def one_point(p):
        # signed violations
        viol = G @ p - hv                                    # (E,)
        inside = jnp.all(viol <= 0.0)

        # projection onto each edge segment
        a, b = starts, verts                                 # (E, 2)
        ab = b - a
        t = jnp.clip(jnp.einsum("e,ed->e", jnp.ones(E),
                                (p - a) * ab) / jnp.maximum(
                                    jnp.sum(ab * ab, axis=1), 1e-12), 0.0, 1.0)
        proj = a + t[:, None] * ab                           # (E, 2)
        d2 = jnp.sum((p - proj) ** 2, axis=1)
        i_best = jnp.argmin(d2)
        cp = proj[i_best]
        dist = jnp.sqrt(jnp.maximum(d2[i_best], 1e-30))

        nu = (p - cp) / jnp.maximum(dist, 1e-12)             # unit outward dir

        # recover mu: active faces are those with G_i cp ~= h_i; solve
        # least-squares G_act' mu = nu on the (at most 2) active faces.
        act = jnp.abs(G @ cp - hv) < 1e-4 * (1.0 + jnp.abs(hv))  # (E,)
        Ga = G * act[:, None]                                # zero inactive rows
        # solve min ||Ga' mu - nu||^2 with ridge; inactive rows get mu ~ 0
        M = Ga @ Ga.T + 1e-9 * jnp.eye(E)
        mu = jnp.linalg.solve(M, Ga @ nu)
        mu = jnp.maximum(mu * act, 0.0)

        mu = jnp.where(inside, jnp.zeros(E), mu)
        d = jnp.where(inside, 0.0, dist)
        return mu, d

    return jax.vmap(one_point)(points)


def _project_dual(mu: jnp.ndarray, G: jnp.ndarray, iters: int = 30):
    """Dykstra projection onto {mu >= 0} ∩ {||G' mu|| <= 1}."""

    def ball_proj(m):
        v = G.T @ m
        nrm = jnp.linalg.norm(v)
        scale = jnp.where(nrm > 1.0, 1.0 / nrm, 1.0)
        # projection onto the ellipsoidal constraint is approximated by
        # scaling; exact for nrm <= 1 and asymptotically correct near the
        # boundary — Dykstra iterations tighten the intersection.
        return m * scale

    def body(carry, _):
        m, p1, p2 = carry
        y = jnp.maximum(m + p1, 0.0)
        p1 = m + p1 - y
        m2 = ball_proj(y + p2)
        p2 = y + p2 - m2
        return (m2, p1, p2), None

    (mu, _, _), _ = jax.lax.scan(
        body, (mu, jnp.zeros_like(mu), jnp.zeros_like(mu)), None, length=iters)
    return jnp.maximum(mu, 0.0)


def dual_ascent_labels(G: jnp.ndarray, h: jnp.ndarray, points: jnp.ndarray,
                       iters: int = 200, lr: float = 0.2):
    """Batched projected-gradient ascent on the dual (numerical label path).

    Independent of the geometric shortcut; used to cross-validate labels and
    as the TPU-friendly fallback for geometries given directly as (G, h).
    """
    G = jnp.asarray(G)
    E = G.shape[0]
    hv = jnp.asarray(h).reshape(-1)
    grad = points @ G.T - hv[None, :]                        # (N, E) = (Gp - h)'

    def body(mu, _):
        mu = mu + lr * grad
        mu = jax.vmap(lambda m: _project_dual(m, G))(mu)
        return mu, None

    mu0 = jnp.zeros((points.shape[0], E), dtype=points.dtype)
    mu, _ = jax.lax.scan(body, mu0, None, length=iters)
    d = jnp.sum(mu * grad, axis=1)
    return mu, jnp.maximum(d, 0.0)
