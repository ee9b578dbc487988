"""Robot geometry + kinematics tests.

Verifies the closed-form linearizations against jax.jacobian of the exact
models — the analytic oracle the reference never had (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neupan_tpu.robot import Robot, rectangle_vertices


def make_robot(kind: str) -> Robot:
    return Robot.create(
        receding=10,
        step_time=0.1,
        kinematics=kind,
        max_speed=[8, 1.0],
        max_acce=[8, 3.0],
        length=1.6,
        width=2.0,
        wheelbase=1.0 if kind == "acker" else None,
    )


def test_rectangle_vertices_wheelbase_offset():
    v = rectangle_vertices(4.6, 1.6, 3.0)
    # x span: [-(4.6-3)/2, -(4.6-3)/2 + 4.6] = [-0.8, 3.8]
    assert np.isclose(v[0].min(), -0.8)
    assert np.isclose(v[0].max(), 3.8)
    assert np.isclose(v[1].min(), -0.8)
    assert np.isclose(v[1].max(), 0.8)


def test_robot_geometry_diff_rectangle():
    robot = make_robot("diff")
    G, h = robot.G, robot.h
    assert G.shape == (4, 2)
    # vertices on the boundary of Gx <= h
    assert np.all(G @ robot.vertices - h <= 1e-9)
    assert np.all(G @ np.zeros((2, 1)) - h < 0)


def test_robot_requires_kinematics():
    with pytest.raises(ValueError):
        Robot.create(length=1.0, width=1.0)


def test_acker_steer_clamp(capsys):
    r = Robot.create(kinematics="acker", length=4.6, width=1.6, wheelbase=3,
                     max_speed=[8, 2.0], max_acce=[8, 3])
    assert r.max_speed[1] == 1.57


def test_robot_hashable_static_arg():
    r1 = make_robot("diff")
    r2 = make_robot("diff")
    assert hash(r1) == hash(r2)
    assert r1 == r2


@pytest.mark.parametrize("kind", ["diff", "acker", "omni"])
def test_linearization_matches_autodiff(kind):
    robot = make_robot(kind)
    rng = np.random.default_rng(0)
    T = robot.T
    nom_s = jnp.asarray(rng.normal(size=(3, T + 1)), dtype=jnp.float32)
    nom_u = jnp.asarray(rng.uniform(-0.8, 0.8, size=(2, T)), dtype=jnp.float32)

    A, B, C = robot.linearize(nom_s, nom_u)
    assert A.shape == (T, 3, 3) and B.shape == (T, 3, 2) and C.shape == (T, 3, 1)

    for t in range(T):
        s_t, u_t = nom_s[:, t], nom_u[:, t]
        Ja = jax.jacobian(lambda s: robot.step(s, u_t))(s_t)
        Jb = jax.jacobian(lambda u: robot.step(s_t, u))(u_t)
        f0 = robot.step(s_t, u_t)
        np.testing.assert_allclose(A[t], Ja, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(B[t], Jb, rtol=1e-4, atol=1e-5)
        # C must reproduce the exact step at the nominal point:
        # f(nom) = A nom_s + B nom_u + C
        recon = A[t] @ s_t + B[t] @ u_t + C[t, :, 0]
        np.testing.assert_allclose(recon, f0, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kind", ["diff", "acker", "omni"])
def test_rollout_matches_sequential_steps(kind):
    robot = make_robot(kind)
    rng = np.random.default_rng(1)
    s0 = jnp.asarray(rng.normal(size=(3,)), dtype=jnp.float32)
    u_seq = jnp.asarray(rng.uniform(-1, 1, size=(2, robot.T)), dtype=jnp.float32)

    states = robot.rollout(s0, u_seq)
    assert states.shape == (3, robot.T + 1)

    s = s0
    for t in range(robot.T):
        s = robot.step(s, u_seq[:, t])
        np.testing.assert_allclose(states[:, t + 1], s, rtol=1e-5, atol=1e-6)


def test_omni_step_semantics():
    # omni control = [speed, orientation]
    robot = make_robot("omni")
    s = jnp.array([0.0, 0.0, 0.3])
    u = jnp.array([2.0, np.pi / 2])
    nxt = robot.step(s, u)
    np.testing.assert_allclose(np.asarray(nxt), [0.0, 0.2, 0.3], atol=1e-6)
