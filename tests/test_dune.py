"""DUNE op tests: point flow, lambda/distance math, masked top-k."""

import jax
import jax.numpy as jnp
import numpy as np

from neupan_tpu.models import obs_point_net
from neupan_tpu.ops.dune import dune_forward, generate_point_flow


def setup_geometry():
    # unit square around origin: G x <= h
    G = jnp.asarray([[0.0, -1.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
    h = jnp.asarray([[0.5], [0.5], [0.5], [0.5]])
    return G, h


def test_generate_point_flow_static_robot():
    nom_s = jnp.zeros((3, 4))  # robot at origin, theta 0, all frames
    pts = jnp.asarray([[1.0, 2.0], [0.0, 1.0]])
    vels = jnp.zeros_like(pts)
    pf, R, glob = generate_point_flow(nom_s, pts, vels, 0.1)
    assert pf.shape == (4, 2, 2) and R.shape == (4, 2, 2)
    # identity transform: flow == world points
    np.testing.assert_allclose(np.asarray(pf[0]), np.asarray(pts), atol=1e-6)
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(2), atol=1e-6)


def test_generate_point_flow_velocity_advance():
    nom_s = jnp.zeros((3, 3))
    pts = jnp.asarray([[1.0], [0.0]])
    vels = jnp.asarray([[2.0], [0.0]])
    pf, _, glob = generate_point_flow(nom_s, pts, vels, 0.1)
    # frame i: p + i * dt * v
    np.testing.assert_allclose(np.asarray(glob[:, 0, 0]), [1.0, 1.2, 1.4],
                               atol=1e-6)


def test_generate_point_flow_rotation():
    theta = np.pi / 2
    nom_s = jnp.asarray([[1.0], [2.0], [theta]]) * jnp.ones((3, 2))
    pts = jnp.asarray([[1.0], [3.0]])
    vels = jnp.zeros_like(pts)
    pf, R, _ = generate_point_flow(nom_s, pts, vels, 0.1)
    # p0 = R' (p - t): p - t = (0, 1); R(90deg)' (0,1) = (1, 0)
    np.testing.assert_allclose(np.asarray(pf[0, :, 0]), [1.0, 0.0], atol=1e-6)


def test_dune_forward_distance_and_topk():
    G, h = setup_geometry()
    params = obs_point_net.init_params(jax.random.PRNGKey(0), 2, 4)
    T = 3
    P = 8
    nom_s = jnp.zeros((3, T + 1))
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(1.0, 5.0, size=(2, P)), dtype=jnp.float32)
    vels = jnp.zeros_like(pts)
    mask = jnp.asarray([True] * 6 + [False] * 2)

    pf, R, glob = generate_point_flow(nom_s, pts, vels, 0.1)
    out = dune_forward(params, G, h, pf, R, glob, mask, k=4)

    assert out.mu_k.shape == (T + 1, 4, 4)
    assert out.lam_k.shape == (T + 1, 2, 4)
    assert out.dist_k.shape == (T + 1, 4)
    # distances sorted ascending per frame
    d = np.asarray(out.dist_k)
    assert np.all(np.diff(d, axis=1) >= -1e-6)
    # all top-k slots valid (6 valid points >= k=4)
    assert np.all(np.asarray(out.valid_k))
    # min_distance equals the smallest frame-0 distance
    assert np.isclose(float(out.min_distance), d[0, 0], atol=1e-6)

    # check the distance formula directly: d = mu'(G p0 - h)
    mu = obs_point_net.forward(params, jnp.swapaxes(pf, 1, 2))
    Gp = np.einsum("eb,tbp->tep", np.asarray(G), np.asarray(pf)) - \
        np.asarray(h).reshape(1, 4, 1)
    dist_all = np.einsum("tpe,tep->tp", np.asarray(mu), Gp)
    dist_all = np.where(np.asarray(mask)[None, :], dist_all, 1e9)
    np.testing.assert_allclose(np.sort(dist_all, axis=1)[:, :4], d, rtol=1e-5,
                               atol=1e-6)


def test_dune_forward_lambda_formula():
    G, h = setup_geometry()
    params = obs_point_net.init_params(jax.random.PRNGKey(1), 2, 4)
    T = 1
    nom_s = jnp.asarray(np.random.default_rng(1).normal(size=(3, T + 1)),
                        dtype=jnp.float32)
    pts = jnp.asarray([[2.0, 3.0], [1.0, -1.0]], dtype=jnp.float32)
    vels = jnp.zeros_like(pts)
    mask = jnp.asarray([True, True])

    pf, R, glob = generate_point_flow(nom_s, pts, vels, 0.1)
    out = dune_forward(params, G, h, pf, R, glob, mask, k=2)

    # recompute lam = -R G' mu for the sorted points
    mu = np.asarray(out.mu_k)           # (T+1, E, K)
    for t in range(T + 1):
        lam_expect = -np.asarray(R[t]) @ np.asarray(G).T @ mu[t]
        np.testing.assert_allclose(np.asarray(out.lam_k[t]), lam_expect,
                                   rtol=1e-5, atol=1e-6)


def test_dune_forward_fewer_points_than_k():
    G, h = setup_geometry()
    params = obs_point_net.init_params(jax.random.PRNGKey(2), 2, 4)
    nom_s = jnp.zeros((3, 2))
    pts = jnp.asarray([[2.0, 9.0, 9.0], [0.0, 9.0, 9.0]], dtype=jnp.float32)
    mask = jnp.asarray([True, False, False])
    pf, R, glob = generate_point_flow(nom_s, pts, jnp.zeros_like(pts), 0.1)
    out = dune_forward(params, G, h, pf, R, glob, mask, k=3)
    v = np.asarray(out.valid_k)
    assert v[:, 0].all() and not v[:, 1:].any()


def square_vertices():
    return jnp.asarray([[-0.5, 0.5, 0.5, -0.5], [-0.5, -0.5, 0.5, 0.5]])


def test_signed_polygon_distance_analytic():
    from neupan_tpu.ops.dune import signed_polygon_distance

    G, h = setup_geometry()
    V = square_vertices()
    pts = jnp.asarray([
        [2.0, 0.0],    # right of square: d = 1.5
        [0.0, 0.0],    # center: d = -0.5
        [1.5, 1.5],    # corner diagonal: d = sqrt(2)
        [0.4, 0.0],    # inside near right face: d = -0.1
        [-3.0, 0.0],   # left: d = 2.5
    ]).T
    d = np.asarray(signed_polygon_distance(V, G, h, pts))
    np.testing.assert_allclose(
        d, [1.5, -0.5, np.sqrt(2.0), -0.1, 2.5], rtol=1e-5, atol=1e-6)


def test_signed_polygon_distance_vs_brute_force():
    from neupan_tpu.ops.dune import signed_polygon_distance
    from neupan_tpu.robot import Robot

    robot = Robot.create(receding=2, step_time=0.1, kinematics="diff",
                         max_speed=[8, 1], max_acce=[8, 3],
                         length=1.6, width=2.0)
    V = jnp.asarray(robot.vertices, jnp.float32)
    G = jnp.asarray(robot.G, jnp.float32)
    h = jnp.asarray(robot.h, jnp.float32)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-6, 6, (2, 500)).astype(np.float32)
    d = np.asarray(signed_polygon_distance(V, G, h, jnp.asarray(pts)))

    verts = np.asarray(robot.vertices)
    segs = []
    for i in range(verts.shape[1]):
        a, b = verts[:, i], verts[:, (i + 1) % verts.shape[1]]
        ts = np.linspace(0, 1, 2001)[None, :]
        segs.append(a[:, None] + (b - a)[:, None] * ts)
    bound = np.concatenate(segs, axis=1)
    d_bound = np.sqrt(((pts[:, :, None] - bound[:, None, :]) ** 2).sum(0)).min(1)
    inside = np.all(np.asarray(robot.G) @ pts <= np.asarray(robot.h), axis=0)
    d_ref = np.where(inside, -d_bound, d_bound)
    np.testing.assert_allclose(d, d_ref, atol=2e-5)


def test_dune_exact_select_matches_mlp_on_separated_points():
    """With well-separated distances the exact and mlp selections agree and
    all DuneOutput fields coincide (same points, same learned duals)."""
    from neupan_tpu.models.obs_point_net import load_checkpoint
    import os

    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples/model/diff_robot_default/model.npz")
    if not os.path.exists(ckpt):
        import pytest
        pytest.skip("example checkpoint missing")
    from neupan_tpu.robot import Robot

    robot = Robot.create(receding=4, step_time=0.1, kinematics="diff",
                         max_speed=[8, 1], max_acce=[8, 3],
                         length=1.6, width=2.0)
    params = load_checkpoint(ckpt)
    G = jnp.asarray(robot.G, jnp.float32)
    h = jnp.asarray(robot.h, jnp.float32)
    V = jnp.asarray(robot.vertices, jnp.float32)

    # radially spread points: consecutive distance gaps ~0.35 >> MLP error
    radii = np.linspace(2.0, 9.0, 21)
    ang = np.linspace(0, 2 * np.pi, 21, endpoint=False)
    pts = jnp.asarray(np.stack([radii * np.cos(ang), radii * np.sin(ang)]),
                      jnp.float32)
    mask = jnp.ones(21, bool)
    nom_s = jnp.zeros((3, 5))
    pf, R, glob = generate_point_flow(nom_s, pts, jnp.zeros_like(pts), 0.1)

    out_m = dune_forward(params, G, h, pf, R, glob, mask, k=5, select="mlp")
    out_e = dune_forward(params, G, h, pf, R, glob, mask, k=5,
                         select="exact", vertices=V)
    np.testing.assert_allclose(np.asarray(out_m.points_k),
                               np.asarray(out_e.points_k), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_m.mu_k),
                               np.asarray(out_e.mu_k), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_m.dist_k),
                               np.asarray(out_e.dist_k), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(out_m.min_distance),
                               float(out_e.min_distance), rtol=1e-5)
    assert np.asarray(out_e.valid_k).all()


def test_dune_exact_select_fewer_points_than_k():
    from neupan_tpu.robot import Robot

    robot = Robot.create(receding=1, step_time=0.1, kinematics="diff",
                         max_speed=[8, 1], max_acce=[8, 3],
                         length=1.0, width=1.0)
    params = obs_point_net.init_params(jax.random.PRNGKey(2), 2, 4)
    G = jnp.asarray(robot.G, jnp.float32)
    h = jnp.asarray(robot.h, jnp.float32)
    V = jnp.asarray(robot.vertices, jnp.float32)
    pts = jnp.asarray([[2.0, 9.0, 9.0], [0.0, 9.0, 9.0]], dtype=jnp.float32)
    mask = jnp.asarray([True, False, False])
    pf, R, glob = generate_point_flow(jnp.zeros((3, 2)), pts,
                                      jnp.zeros_like(pts), 0.1)
    out = dune_forward(params, G, h, pf, R, glob, mask, k=3,
                       select="exact", vertices=V)
    v = np.asarray(out.valid_k)
    assert v[:, 0].all() and not v[:, 1:].any()
