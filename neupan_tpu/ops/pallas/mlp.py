"""Fused Pallas kernel for the DUNE point-encoder MLP.

The DUNE hot loop evaluates a tiny MLP (2 -> 32 x5 -> E, with LayerNorm/tanh/
ReLU interleavings — reference: blocks/obs_point_net.py:31-46) over
(T+1) x P x batch points per control tick.  In plain XLA this is 6 small
matmuls with 11 interleaved elementwise stages; each stage round-trips HBM
when the point count is large.  This kernel keeps the whole chain — all six
matmuls, three layer norms and activations — in VMEM per point-tile, so each
point is read once and written once (streaming, bandwidth-optimal).

Weights are tiny (~5 KB) and live in VMEM for the whole grid.  Points are
tiled along the batch dimension; the feature dimension (32 / E) rides the
lane axis and is padded by Mosaic as needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neupan_tpu.models.obs_point_net import Params

_LN_EPS = 1e-5


def _ln(x, scale, bias):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias


def _mlp_kernel(pts_ref, w0, b0, ln0s, ln0b, w1, b1, w2, b2, ln1s, ln1b,
                w3, b3, w4, b4, ln2s, ln2b, w5, b5, out_ref):
    x = pts_ref[:]
    h = jnp.tanh(_ln(jnp.dot(x, w0[:], preferred_element_type=jnp.float32)
                     + b0[:], ln0s[:], ln0b[:]))
    h = jax.nn.relu(jnp.dot(h, w1[:], preferred_element_type=jnp.float32)
                    + b1[:])
    h = jnp.tanh(_ln(jnp.dot(h, w2[:], preferred_element_type=jnp.float32)
                     + b2[:], ln1s[:], ln1b[:]))
    h = jax.nn.relu(jnp.dot(h, w3[:], preferred_element_type=jnp.float32)
                    + b3[:])
    h = jnp.tanh(_ln(jnp.dot(h, w4[:], preferred_element_type=jnp.float32)
                     + b4[:], ln2s[:], ln2b[:]))
    out_ref[:] = jax.nn.relu(
        jnp.dot(h, w5[:], preferred_element_type=jnp.float32) + b5[:])


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def dune_mlp_pallas(params: Params, points: jnp.ndarray,
                    tile: int = 512, interpret: bool = False) -> jnp.ndarray:
    """Evaluate the DUNE MLP on (N, 2) points -> (N, E) duals.

    Pads N up to a tile multiple; weights are broadcast to every grid step.
    """
    N = points.shape[0]
    E = params["w5"].shape[1]
    n_pad = (-N) % tile
    pts = jnp.pad(points.astype(jnp.float32), ((0, n_pad), (0, 0)))
    Np = pts.shape[0]

    weight_order = [
        "w0", "b0", "ln0_scale", "ln0_bias", "w1", "b1",
        "w2", "b2", "ln1_scale", "ln1_bias", "w3", "b3",
        "w4", "b4", "ln2_scale", "ln2_bias", "w5", "b5",
    ]
    weights = [params[k].astype(jnp.float32) for k in weight_order]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]

    out = pl.pallas_call(
        _mlp_kernel,
        grid=(Np // tile,),
        in_specs=[
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((tile, E), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, E), jnp.float32),
        interpret=interpret,
    )(pts, *weights)
    return out[:N]
