"""DUNE training tests: label correctness and a short end-to-end train run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neupan_tpu.robot import Robot
from neupan_tpu.training.dune_train import DuneTrainer
from neupan_tpu.training.labels import dual_ascent_labels, polygon_distance_labels


def geometry():
    r = Robot.create(kinematics="diff", length=1.6, width=2.0,
                     max_speed=[8, 1], max_acce=[8, 3])
    return (jnp.asarray(r.G, jnp.float32), jnp.asarray(r.h, jnp.float32), r)


def test_labels_match_brute_force_distance():
    G, h, r = geometry()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (200, 2)).astype(np.float32)
    mu, d = polygon_distance_labels(G, h, jnp.asarray(pts))

    verts = r.vertices
    bnd = []
    for i in range(verts.shape[1]):
        a, b = verts[:, i], verts[:, (i + 1) % verts.shape[1]]
        ts = np.linspace(0, 1, 1000)[:, None]
        bnd.append(a + ts * (b - a))
    bnd = np.concatenate(bnd)
    inside = np.all(r.G @ pts.T - r.h <= 1e-9, axis=0)
    d_bf = np.sqrt(((pts[:, None, :] - bnd[None]) ** 2).sum(-1)).min(1)
    d_bf = np.where(inside, 0.0, d_bf)
    np.testing.assert_allclose(np.asarray(d), d_bf, atol=2e-5)


def test_labels_satisfy_dual_constraints_and_value():
    G, h, _ = geometry()
    rng = np.random.default_rng(1)
    pts = rng.uniform(-10, 10, (300, 2)).astype(np.float32)
    mu, d = polygon_distance_labels(G, h, jnp.asarray(pts))
    mu_np = np.asarray(mu)
    assert np.all(mu_np >= 0)
    # ||G' mu|| <= 1
    norms = np.linalg.norm(mu_np @ np.asarray(G), axis=1)
    assert norms.max() <= 1.0 + 1e-4
    # optimal value equals mu'(Gp - h)
    val = (mu_np * (pts @ np.asarray(G).T - np.asarray(h).reshape(-1))).sum(1)
    np.testing.assert_allclose(val, np.asarray(d), atol=1e-5)


def test_dual_ascent_agrees_with_geometry():
    G, h, _ = geometry()
    rng = np.random.default_rng(2)
    pts = rng.uniform(-5, 5, (64, 2)).astype(np.float32)
    mu_g, d_g = polygon_distance_labels(G, h, jnp.asarray(pts))
    mu_a, d_a = dual_ascent_labels(G, h, jnp.asarray(pts), iters=400, lr=0.1)
    # the ascent path approximates the norm-ball projection; corner regions
    # carry the largest error — bound worst-case and mean separately
    err = np.abs(np.asarray(d_a) - np.asarray(d_g))
    assert err.mean() < 5e-2
    assert err.max() < 0.3


@pytest.mark.slow
def test_short_training_run_reduces_loss(tmp_path):
    G, h, _ = geometry()
    trainer = DuneTrainer(np.asarray(G), np.asarray(h), str(tmp_path))
    params, ckpt = trainer.start(data_size=2000, epoch=30, batch_size=128,
                                 valid_freq=30, save_freq=30, lr=1e-3)
    assert ckpt is not None
    # loss file exists and losses decreased
    results = (tmp_path / "results.txt").read_text()
    assert "Epoch 30/30" in results or "Epoch 0/30" in results

    # trained model beats random init on distance prediction
    from neupan_tpu.models import obs_point_net

    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-25, 25, (500, 2)).astype(np.float32))
    mu_l, d_l = polygon_distance_labels(G, h, pts)
    mu_p = obs_point_net.forward(params, pts)
    d_p = jnp.einsum("be,be->b", mu_p, pts @ G.T - h.reshape(1, -1))
    err_trained = float(jnp.mean((d_p - d_l) ** 2))

    params0 = obs_point_net.init_params(jax.random.PRNGKey(5), 2, G.shape[0])
    mu_0 = obs_point_net.forward(params0, pts)
    d_0 = jnp.einsum("be,be->b", mu_0, pts @ G.T - h.reshape(1, -1))
    err_random = float(jnp.mean((d_0 - d_l) ** 2))
    assert err_trained < err_random
