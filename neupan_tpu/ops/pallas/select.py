"""Fused Pallas kernel: exact polygon-distance ranking + top-k selection.

This is the DUNE selection stage (ops/dune.py, select="exact") as one
kernel.  The XLA path materializes (T+1, 2, V, P) edge-distance
temporaries (~740 MB at B=256, P=2048) and then runs a full sort-based
top-k over (B*(T+1), P) — together ~5 ms per PAN iteration, all HBM
bandwidth and sort overhead.  The kernel reads the whole (T+1, 2, P)
point flow into VMEM once (~180 KB), computes a ranking key for all
frames in registers, and extracts the K smallest per frame by iterative
masked row-argmin — K is tiny (~10) and the passes are vectorized across
the T+1 frame rows, so the extraction costs ~2*K row reductions total.
Output is just (T+1, K) keys + indices.

Numerics: Mosaic's vector sqrt/divide/rsqrt are ~1e-3 hardware
approximations, so the kernel ranks by a key that needs neither —
    key = normalized face margin      (negative, exact FMAs)   inside
        = squared segment distance    (monotone in distance)   outside
which orders points exactly like the true signed distance; per-edge
reciprocals are precomputed outside in exactly-rounded f32.
Tie-breaking matches lax.top_k: equal keys select the lower index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e9
_LANES = 128  # TPU lane width: K outputs are padded up to one vreg row


def _rank_and_extract(V: int, E: int, K: int, x, y, maskf,
                      verts_ref, edges_ref, Gn_ref, hn_ref, key_ref, idx_ref):
    """Shared body: distance-ranking key + iterative top-k extraction."""
    # outside key: min *squared* distance over edge segments (static unroll)
    d_out_sq = jnp.full_like(x, _INF)
    for j in range(V):
        ax, ay = verts_ref[0, j], verts_ref[1, j]
        ex, ey = edges_ref[0, j], edges_ref[1, j]
        inv_ee = edges_ref[2, j]
        t = jnp.clip(((x - ax) * ex + (y - ay) * ey) * inv_ee, 0.0, 1.0)
        dx = x - (ax + ex * t)
        dy = y - (ay + ey * t)
        d_out_sq = jnp.minimum(d_out_sq, dx * dx + dy * dy)

    # inside key: largest row-normalized face margin (negative inside)
    d_in = jnp.full_like(x, -_INF)
    for e in range(E):
        gx, gy = Gn_ref[e, 0], Gn_ref[e, 1]
        d_in = jnp.maximum(d_in, gx * x + gy * y - hn_ref[e, 0])

    key = jnp.where(d_in <= 0.0, d_in, d_out_sq)
    key = jnp.where(maskf > 0, key, _INF)             # broadcast over frames

    # iterative top-k extraction, vectorized across the T+1 frame rows:
    # each pass is one row-min + row-argmin + masked refill.  Results
    # accumulate in vregs (scalar VMEM stores don't lower on Mosaic).
    iota = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (key.shape[0], _LANES), 1)
    acc_d = jnp.full((key.shape[0], _LANES), _INF, jnp.float32)
    acc_i = jnp.zeros((key.shape[0], _LANES), jnp.int32)
    for kk in range(K):
        m = jnp.min(key, axis=1, keepdims=True)              # (T+1, 1)
        am = jnp.argmin(key, axis=1, keepdims=True).astype(jnp.int32)
        acc_d = jnp.where(lane == kk, m, acc_d)
        acc_i = jnp.where(lane == kk, am, acc_i)
        key = jnp.where(iota == am, _INF, key)
    key_ref[...] = acc_d
    idx_ref[...] = acc_i


def _select_kernel(V: int, E: int, K: int,
                   pf_ref, mask_ref, verts_ref, edges_ref, Gn_ref, hn_ref,
                   key_ref, idx_ref):
    x = pf_ref[:, 0, :]                            # (T+1, P) robot-frame x
    y = pf_ref[:, 1, :]                            # (T+1, P)
    _rank_and_extract(V, E, K, x, y, mask_ref[0:1, :],
                      verts_ref, edges_ref, Gn_ref, hn_ref, key_ref, idx_ref)


def _select_flow_kernel(V: int, E: int, K: int,
                        pts_ref, vel_ref, mask_ref, tf_ref,
                        verts_ref, edges_ref, Gn_ref, hn_ref,
                        key_ref, idx_ref):
    """Selection with the point flow generated IN-KERNEL.

    Instead of reading a pre-materialized (T+1, 2, P) point flow (~92 MB
    at B=512, P=2048 — two such arrays dominated the DUNE HBM traffic),
    this kernel reads the raw (2, P) points/velocities once and expands
    each frame's coordinates in registers from the per-frame transform:
        p_glob = p + step_t * v
        x_t =  c_t (px - tx) + s_t (py - ty)      # R_t' (p - trans_t)
        y_t = -s_t (px - tx) + c_t (py - ty)
    tf_ref rows: [c, s, tx, ty, step] as (5, T+1) columns.
    """
    px = pts_ref[0:1, :]                           # (1, P)
    py = pts_ref[1:2, :]
    vx = vel_ref[0:1, :]
    vy = vel_ref[1:2, :]
    c = tf_ref[0:1, :].T                           # (T+1, 1)
    s = tf_ref[1:2, :].T
    tx = tf_ref[2:3, :].T
    ty = tf_ref[3:4, :].T
    step = tf_ref[4:5, :].T
    pxg = px + step * vx                           # (T+1, P)
    pyg = py + step * vy
    dx = pxg - tx
    dy = pyg - ty
    x = c * dx + s * dy
    y = c * dy - s * dx
    _rank_and_extract(V, E, K, x, y, mask_ref[0:1, :],
                      verts_ref, edges_ref, Gn_ref, hn_ref, key_ref, idx_ref)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def select_topk_pallas(point_flow: jnp.ndarray, mask: jnp.ndarray,
                       vertices: jnp.ndarray, G: jnp.ndarray, h: jnp.ndarray,
                       k: int, interpret: bool = False):
    """Exact-distance-ranked top-k selection for every horizon frame.

    Args:
        point_flow: (T+1, 2, P) robot-frame points per frame.
        mask: (P,) bool valid-point mask.
        vertices: (2, V) polygon vertices (CCW), static shape.
        G, h: (E, 2), (E, 1) half-spaces.
        k: number of points to keep per frame (k <= 128).
    Returns:
        key (T+1, k): ascending ranking keys — same ORDER as the true
            signed distance (squared outside / margin inside); INF marks
            invalid (masked) slots.  Not metric distances.
        idx (T+1, k): int32 column indices into P.
    """
    Tp1, _, P = point_flow.shape
    V = vertices.shape[1]
    E = G.shape[0]
    if k > _LANES:
        raise ValueError(f"select_topk_pallas supports k <= {_LANES}")
    maskf = mask.astype(jnp.float32).reshape(1, P)

    verts = vertices.astype(jnp.float32)
    e_xy = jnp.roll(verts, -1, axis=1) - verts               # (2, V)
    inv_ee = 1.0 / jnp.maximum(jnp.sum(e_xy * e_xy, axis=0), 1e-12)
    edges = jnp.concatenate([e_xy, inv_ee[None, :]], axis=0)  # (3, V)
    g_norm = jnp.sqrt(jnp.sum(G * G, axis=1, keepdims=True))
    Gn = (G / g_norm).astype(jnp.float32)                     # (E, 2)
    hn = (h / g_norm).astype(jnp.float32)                     # (E, 1)

    kern = functools.partial(_select_kernel, V, E, k)
    key, idx = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp1, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((Tp1, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(point_flow, maskf, verts, edges, Gn, hn)
    return key[:, :k], idx[:, :k]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def select_topk_flow_pallas(points: jnp.ndarray, velocities: jnp.ndarray,
                            mask: jnp.ndarray, R_all: jnp.ndarray,
                            trans: jnp.ndarray, dt: float,
                            vertices: jnp.ndarray, G: jnp.ndarray,
                            h: jnp.ndarray, k: int, interpret: bool = False):
    """select_topk_pallas with the point flow generated in-kernel.

    Args:
        points: (2, P) world-frame points; velocities: (2, P).
        mask: (P,) bool.
        R_all: (T+1, 2, 2) world-from-robot rotations; trans: (T+1, 2).
        dt: step time (frame t advances points by t*dt*velocity).
        vertices/G/h/k: as select_topk_pallas.
    Returns:
        key (T+1, k), idx (T+1, k) — identical semantics to
        select_topk_pallas on the materialized flow.
    """
    Tp1 = R_all.shape[0]
    P = points.shape[1]
    V = vertices.shape[1]
    E = G.shape[0]
    if k > _LANES:
        raise ValueError(f"select_topk_flow_pallas supports k <= {_LANES}")
    maskf = mask.astype(jnp.float32).reshape(1, P)

    # per-frame transform table (5, T+1): c, s, tx, ty, step
    steps = jnp.arange(Tp1, dtype=jnp.float32) * dt
    tf = jnp.stack([R_all[:, 0, 0], R_all[:, 1, 0], trans[:, 0],
                    trans[:, 1], steps], axis=0).astype(jnp.float32)

    verts = vertices.astype(jnp.float32)
    e_xy = jnp.roll(verts, -1, axis=1) - verts               # (2, V)
    inv_ee = 1.0 / jnp.maximum(jnp.sum(e_xy * e_xy, axis=0), 1e-12)
    edges = jnp.concatenate([e_xy, inv_ee[None, :]], axis=0)  # (3, V)
    g_norm = jnp.sqrt(jnp.sum(G * G, axis=1, keepdims=True))
    Gn = (G / g_norm).astype(jnp.float32)                     # (E, 2)
    hn = (h / g_norm).astype(jnp.float32)                     # (E, 1)

    kern = functools.partial(_select_flow_kernel, V, E, k)
    key, idx = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp1, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((Tp1, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(points.astype(jnp.float32), velocities.astype(jnp.float32), maskf, tf,
      verts, edges, Gn, hn)
    return key[:, :k], idx[:, :k]
