"""ObsPointNet — the DUNE point encoder, as a pure-JAX parameter pytree.

Architecture parity with the reference MLP (reference: blocks/obs_point_net.py:
25-49): 2 -> 32 [LayerNorm, tanh] -> 32 [ReLU] -> 32 [LayerNorm, tanh]
-> 32 [ReLU] -> 32 [LayerNorm, tanh] -> E [ReLU], hidden_dim = 32.

Parameters are stored as a flat dict of jnp arrays so the forward pass is a
pure function — trivially vmappable/shardable and consumable by the Pallas
fused kernel.  A converter from the reference's ``.pth`` checkpoints enables
golden numeric comparisons and reuse of the 33 shipped pretrained models.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

HIDDEN_DIM = 32
# Indices of Linear layers inside the reference nn.Sequential, used only for
# checkpoint key mapping: Linear at 0,3,5,8,10,13; LayerNorm at 1,6,11.
_TORCH_LINEAR_IDX = (0, 3, 5, 8, 10, 13)
_TORCH_LN_IDX = (1, 6, 11)

Params = Dict[str, jnp.ndarray]


def init_params(key: jax.Array, input_dim: int = 2, output_dim: int = 4,
                hidden_dim: int = HIDDEN_DIM, dtype=jnp.float32) -> Params:
    """Initialize parameters (Kaiming-uniform fan-in, like torch defaults)."""
    dims = [input_dim] + [hidden_dim] * 5 + [output_dim]
    params: Params = {}
    keys = jax.random.split(key, len(dims) - 1)
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        bound = 1.0 / np.sqrt(d_in)
        wk, bk = jax.random.split(keys[i])
        params[f"w{i}"] = jax.random.uniform(wk, (d_in, d_out), dtype, -bound, bound)
        params[f"b{i}"] = jax.random.uniform(bk, (d_out,), dtype, -bound, bound)
    for j, width in enumerate([hidden_dim, hidden_dim, hidden_dim]):
        params[f"ln{j}_scale"] = jnp.ones((width,), dtype)
        params[f"ln{j}_bias"] = jnp.zeros((width,), dtype)
    return params


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def forward(params: Params, points: jnp.ndarray) -> jnp.ndarray:
    """Map points (..., 2) to nonnegative duals mu (..., E).

    Layer sequence mirrors the reference exactly; output ReLU enforces mu >= 0.
    """
    x = points
    # block 1: Linear + LN + tanh
    x = jnp.tanh(_layer_norm(x @ params["w0"] + params["b0"],
                             params["ln0_scale"], params["ln0_bias"]))
    # block 2: Linear + ReLU
    x = jax.nn.relu(x @ params["w1"] + params["b1"])
    # block 3: Linear + LN + tanh
    x = jnp.tanh(_layer_norm(x @ params["w2"] + params["b2"],
                             params["ln1_scale"], params["ln1_bias"]))
    # block 4: Linear + ReLU
    x = jax.nn.relu(x @ params["w3"] + params["b3"])
    # block 5: Linear + LN + tanh
    x = jnp.tanh(_layer_norm(x @ params["w4"] + params["b4"],
                             params["ln2_scale"], params["ln2_bias"]))
    # head: Linear + ReLU  (mu >= 0)
    return jax.nn.relu(x @ params["w5"] + params["b5"])


# ---------------------------------------------------------------------------
# Checkpoint interop
# ---------------------------------------------------------------------------

def params_from_torch_state_dict(state_dict) -> Params:
    """Convert a reference ``ObsPointNet`` torch state_dict to our pytree.

    Torch Linear stores weight as (out, in); we keep (in, out) so the forward
    pass is a plain right-multiplication.
    """
    params: Params = {}

    def _np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                          dtype=np.float32)

    for i, idx in enumerate(_TORCH_LINEAR_IDX):
        params[f"w{i}"] = jnp.asarray(_np(state_dict[f"MLP.{idx}.weight"]).T)
        params[f"b{i}"] = jnp.asarray(_np(state_dict[f"MLP.{idx}.bias"]))
    for j, idx in enumerate(_TORCH_LN_IDX):
        params[f"ln{j}_scale"] = jnp.asarray(_np(state_dict[f"MLP.{idx}.weight"]))
        params[f"ln{j}_bias"] = jnp.asarray(_np(state_dict[f"MLP.{idx}.bias"]))
    return params


def load_checkpoint(path: str) -> Params:
    """Load DUNE parameters from either a torch ``.pth`` or a numpy ``.npz``."""
    if path.endswith(".npz"):
        data = np.load(path)
        return {k: jnp.asarray(data[k]) for k in data.files}
    # torch checkpoint (reference-format state_dict)
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return params_from_torch_state_dict(state_dict)


def save_checkpoint(path: str, params: Params) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
