"""Scenario-parallel tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neupan_tpu.models import obs_point_net
from neupan_tpu.ops.nrmp import AdjustParams, NRMPSpec
from neupan_tpu.ops.pan import PANSpec
from neupan_tpu.ops.qp import ADMMConfig
from neupan_tpu.parallel import (
    batched_init_state,
    batched_planner_step,
    make_mesh,
    sharded_planner_step,
)
from neupan_tpu.robot import Robot


def small_spec(T=3, K=2, P=8):
    robot = Robot.create(receding=T, step_time=0.1, kinematics="diff",
                         max_speed=[4, 2], max_acce=[4, 2], length=1.6,
                         width=1.0)
    nrmp = NRMPSpec(T=T, K=K, kinematics="diff",
                    speed_bound=tuple(robot.speed_bound[:, 0]),
                    acce_bound=tuple(robot.acce_bound[:, 0]), ro_obs=100.0)
    return PANSpec(robot=robot, nrmp=nrmp, iter_num=1, dune_max_num=P,
                   admm=ADMMConfig(iters=40))


def batch_inputs(spec, B, seed=0):
    rng = np.random.default_rng(seed)
    T, P = spec.robot.T, spec.dune_max_num
    f32 = jnp.float32
    nom_u = jnp.zeros((B, 2, T), f32)
    nom_s = jax.vmap(lambda s0, u: spec.robot.rollout(s0, u))(
        jnp.zeros((B, 3), f32), nom_u)
    ref_s = jnp.broadcast_to(
        jnp.asarray(np.linspace([0, 0, 0], [1, 0, 0], T + 1).T, f32),
        (B, 3, T + 1))
    ref_us = jnp.ones((B, T), f32)
    pts = jnp.asarray(rng.uniform(1.5, 4.0, (B, 2, P)), f32)
    vels = jnp.zeros((B, 2, P), f32)
    mask = jnp.ones((B, P), bool)
    return nom_s, nom_u, ref_s, ref_us, pts, vels, mask


def shared(spec):
    params = obs_point_net.init_params(jax.random.PRNGKey(0), 2,
                                       spec.robot.edge_dim)
    G = jnp.asarray(spec.robot.G, jnp.float32)
    h = jnp.asarray(spec.robot.h, jnp.float32)
    adj = AdjustParams(q_s=jnp.asarray(1.0), p_u=jnp.asarray(1.0),
                       eta=jnp.asarray(8.0), d_max=jnp.asarray(1.0),
                       d_min=jnp.asarray(0.1))
    return params, G, h, adj


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_matches_batched():
    spec = small_spec()
    params, G, h, adj = shared(spec)
    B = 8
    args = batch_inputs(spec, B)
    state = batched_init_state(spec, B)

    ref = batched_planner_step(spec, params, G, h, adj, *args, state)

    mesh = make_mesh(8)
    out = sharded_planner_step(spec, mesh, params, G, h, adj, *args, state)
    np.testing.assert_allclose(np.asarray(out.opt_u), np.asarray(ref.opt_u),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.min_distance),
                               np.asarray(ref.min_distance), rtol=1e-4,
                               atol=1e-5)


def test_sharded_output_sharding():
    spec = small_spec()
    params, G, h, adj = shared(spec)
    B = 16
    args = batch_inputs(spec, B)
    state = batched_init_state(spec, B)
    mesh = make_mesh(8)
    out = sharded_planner_step(spec, mesh, params, G, h, adj, *args, state)
    # output stays distributed over the mesh
    assert len(out.opt_u.sharding.device_set) == 8
