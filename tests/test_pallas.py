"""Pallas fused-MLP kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neupan_tpu.models import obs_point_net
from neupan_tpu.ops.pallas.mlp import dune_mlp_pallas


def test_fused_mlp_matches_reference_forward():
    params = obs_point_net.init_params(jax.random.PRNGKey(0), 2, 4)
    pts = jnp.asarray(np.random.default_rng(0).uniform(-5, 5, (300, 2)),
                      dtype=jnp.float32)
    ref = obs_point_net.forward(params, pts)
    out = dune_mlp_pallas(params, pts, tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_fused_mlp_ragged_size_padding():
    params = obs_point_net.init_params(jax.random.PRNGKey(1), 2, 4)
    pts = jnp.asarray(np.random.default_rng(1).uniform(-5, 5, (77, 2)),
                      dtype=jnp.float32)
    ref = obs_point_net.forward(params, pts)
    out = dune_mlp_pallas(params, pts, tile=64, interpret=True)
    assert out.shape == (77, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
