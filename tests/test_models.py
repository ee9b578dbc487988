"""ObsPointNet tests: forward shape/sign, and golden parity vs the
reference's pretrained torch checkpoints (skipped if unavailable)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neupan_tpu.models import obs_point_net

REF_CKPT = "/root/reference/example/model/diff_robot_default/model_5000.pth"


def test_init_and_forward_shapes():
    params = obs_point_net.init_params(jax.random.PRNGKey(0), 2, 4)
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(17, 2)),
                      dtype=jnp.float32)
    mu = obs_point_net.forward(params, pts)
    assert mu.shape == (17, 4)
    assert np.all(np.asarray(mu) >= 0.0)  # output ReLU enforces mu >= 0


def test_forward_batch_axes():
    params = obs_point_net.init_params(jax.random.PRNGKey(1), 2, 4)
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(3, 5, 2)),
                      dtype=jnp.float32)
    mu = obs_point_net.forward(params, pts)
    assert mu.shape == (3, 5, 4)
    flat = obs_point_net.forward(params, pts.reshape(15, 2))
    np.testing.assert_allclose(np.asarray(mu).reshape(15, 4), np.asarray(flat),
                               rtol=1e-5, atol=1e-6)


def test_save_load_roundtrip(tmp_path):
    params = obs_point_net.init_params(jax.random.PRNGKey(2), 2, 4)
    path = str(tmp_path / "ckpt.npz")
    obs_point_net.save_checkpoint(path, params)
    loaded = obs_point_net.load_checkpoint(path)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]), np.asarray(loaded[k]))


@pytest.mark.skipif(not os.path.exists(REF_CKPT),
                    reason="reference checkpoint not available")
def test_golden_parity_with_reference_checkpoint():
    """Our forward must reproduce the reference torch MLP bit-for-bit-ish."""
    import torch

    params = obs_point_net.load_checkpoint(REF_CKPT)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-10, 10, size=(256, 2)).astype(np.float32)

    ours = np.asarray(obs_point_net.forward(params, jnp.asarray(pts)))

    # rebuild the reference architecture in torch and load the state dict
    sd = torch.load(REF_CKPT, map_location="cpu", weights_only=True)
    layers = []
    dims = {0: (2, 32), 3: (32, 32), 5: (32, 32), 8: (32, 32), 10: (32, 32),
            13: (32, 4)}
    seq = torch.nn.Sequential(
        torch.nn.Linear(2, 32), torch.nn.LayerNorm(32), torch.nn.Tanh(),
        torch.nn.Linear(32, 32), torch.nn.ReLU(),
        torch.nn.Linear(32, 32), torch.nn.LayerNorm(32), torch.nn.Tanh(),
        torch.nn.Linear(32, 32), torch.nn.ReLU(),
        torch.nn.Linear(32, 32), torch.nn.LayerNorm(32), torch.nn.Tanh(),
        torch.nn.Linear(32, 4), torch.nn.ReLU(),
    )
    seq.load_state_dict({k.replace("MLP.", ""): v for k, v in sd.items()})
    with torch.no_grad():
        theirs = seq(torch.from_numpy(pts)).numpy()

    # f32 op-ordering differences between XLA and torch; 1e-4 absolute is
    # far below any physically meaningful dual magnitude here
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
