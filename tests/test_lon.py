"""LON tests: gradient flow through the QP into the adjust parameters."""

import jax
import jax.numpy as jnp
import numpy as np

from neupan_tpu.lon import LONTuner, distance_loss, step_loss_and_grad
from neupan_tpu.models import obs_point_net
from neupan_tpu.ops.nrmp import AdjustParams, NRMPSpec
from neupan_tpu.ops.pan import PANSpec, init_state
from neupan_tpu.ops.qp import ADMMConfig
from neupan_tpu.robot import Robot


def setup(T=3, K=2, P=6):
    robot = Robot.create(receding=T, step_time=0.1, kinematics="diff",
                         max_speed=[4, 2], max_acce=[4, 2], length=1.6,
                         width=1.0)
    nrmp = NRMPSpec(T=T, K=K, kinematics="diff",
                    speed_bound=tuple(robot.speed_bound[:, 0]),
                    acce_bound=tuple(robot.acce_bound[:, 0]), ro_obs=100.0)
    spec = PANSpec(robot=robot, nrmp=nrmp, iter_num=1, dune_max_num=P,
                   admm=ADMMConfig(iters=60))
    params = obs_point_net.init_params(jax.random.PRNGKey(0), 2,
                                       robot.edge_dim)
    G = jnp.asarray(robot.G, jnp.float32)
    h = jnp.asarray(robot.h, jnp.float32)
    adj = AdjustParams(q_s=jnp.asarray(1.0), p_u=jnp.asarray(1.0),
                       eta=jnp.asarray(8.0), d_max=jnp.asarray(1.0),
                       d_min=jnp.asarray(0.1))

    rng = np.random.default_rng(0)
    T_, P_ = T, P
    f32 = jnp.float32
    nom_u = jnp.zeros((2, T_), f32)
    nom_s = robot.rollout(jnp.zeros(3, f32), nom_u)
    ref_s = jnp.asarray(np.linspace([0, 0, 0], [1, 0, 0], T_ + 1).T, f32)
    ref_us = jnp.ones((T_,), f32)
    pts = jnp.asarray(rng.uniform(0.9, 2.0, (2, P_)), f32)
    vels = jnp.zeros((2, P_), f32)
    mask = jnp.ones((P_,), bool)
    return (spec, params, G, h, adj,
            (nom_s, nom_u, ref_s, ref_us, pts, vels, mask))


def test_distance_loss_branches():
    d = jnp.asarray([0.5, 0.5, 0.5])
    assert float(distance_loss(d, jnp.asarray(0.1), 0.3)) == 10 * (50 - 1.5)
    assert float(distance_loss(d, jnp.asarray(1.0), 0.3, stuck=True)) == \
        10 * (50 + 1.5)
    assert float(distance_loss(d, jnp.asarray(1.0), 0.3)) == 0.0


def test_gradients_nonzero_and_finite():
    spec, params, G, h, adj, inputs = setup()
    loss, grads, out = step_loss_and_grad(
        spec, params, G, h, adj, *inputs, init_state(spec),
        collision_threshold=10.0)  # force the near-collision branch
    assert np.isfinite(float(loss))
    g = np.array([float(jnp.sum(jnp.abs(x))) for x in grads])
    assert np.all(np.isfinite(g))
    # eta and d_max influence d directly -> nonzero gradients
    assert float(jnp.sum(jnp.abs(grads.eta))) > 0 or \
        float(jnp.sum(jnp.abs(grads.d_max))) > 0


def test_eta_gradient_sign_matches_finite_difference():
    spec, params, G, h, adj, inputs = setup()

    def loss_at(eta):
        a = adj._replace(eta=jnp.asarray(eta, jnp.float32))
        loss, _, _ = step_loss_and_grad(
            spec, params, G, h, a, *inputs, init_state(spec),
            collision_threshold=10.0)
        return float(loss)

    _, grads, _ = step_loss_and_grad(
        spec, params, G, h, adj, *inputs, init_state(spec),
        collision_threshold=10.0)
    eps = 0.05
    fd = (loss_at(8.0 + eps) - loss_at(8.0 - eps)) / (2 * eps)
    g = float(grads.eta)
    if abs(fd) > 1e-6:
        assert np.sign(fd) == np.sign(g)
        np.testing.assert_allclose(g, fd, rtol=0.3, atol=0.05)


def test_vector_qs_gradient_path():
    """The 3-vector q_s arity must carry per-component gradients through
    the QP (reference nrmp.py:171-217 allows scalar or (3,1) q_s)."""
    from neupan_tpu.lon import tracking_losses

    spec, params, G, h, adj, inputs = setup()
    adj3 = adj._replace(q_s=jnp.asarray([1.0, 1.0, 0.5], jnp.float32))

    def loss_fn(out):
        # state tracking depends on q_s through the QP solution
        s_l, u_l = tracking_losses(out, inputs[2], inputs[3])
        return s_l + u_l

    loss, grads, _ = step_loss_and_grad(
        spec, params, G, h, adj3, *inputs, init_state(spec),
        loss_fn=loss_fn)
    assert np.isfinite(float(loss))
    g = np.asarray(grads.q_s)
    assert g.shape == (3,)
    assert np.all(np.isfinite(g))
    assert np.any(np.abs(g) > 0)


def test_tuning_descends_fixed_step_loss():
    """Gradient steps on the adjust parameters must reduce a fixed step's
    loss — the LON capability end-to-end in miniature (reference
    example/LON/LON_corridor.py:115-143 shows episode-loss descent)."""
    spec, params, G, h, adj, inputs = setup()
    from neupan_tpu.lon import LONTuner

    tuner = LONTuner(adj, lr=2e-2, train_fields=("p_u", "eta", "d_max"))
    losses = []
    cur = adj
    for _ in range(12):
        loss, grads, _ = step_loss_and_grad(
            spec, params, G, h, cur, *inputs, init_state(spec),
            collision_threshold=10.0)
        losses.append(float(loss))
        cur = tuner.update(cur, grads)
    assert losses[-1] < losses[0], losses


def test_tuner_updates_only_selected_fields():
    spec, params, G, h, adj, inputs = setup()
    tuner = LONTuner(adj, lr=1e-2, train_fields=("p_u", "eta", "d_max"))
    _, grads, _ = step_loss_and_grad(
        spec, params, G, h, adj, *inputs, init_state(spec),
        collision_threshold=10.0)
    new = tuner.update(adj, grads)
    assert float(new.q_s) == float(adj.q_s)       # frozen
    assert float(new.d_min) == float(adj.d_min)   # frozen
    assert float(new.d_max) >= 1e-3


def test_lon_episode_tuning_reduces_episode_loss():
    """Episode-level regression (VERDICT round-2 #5): LON tuning on the fixed
    corridor episode finds parameters whose frozen replay has a substantially
    lower episode loss than the initial parameters.

    The shipped LON semantics (examples/LON/LON_corridor.py) is
    validation-based BEST-EPOCH selection, because the raw per-epoch loss is
    non-monotone near the documented zero-loss basin (epochs past the optimum
    overshoot; see examples/LON/results_corridor.txt).  This test mirrors
    that: replay after every tuning epoch and assert the best epoch beats the
    initial parameters by a clear margin, not that the LAST epoch does."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "examples"))
    from LON.LON_corridor import run_episode  # noqa: E402
    from neupan_tpu.planner import NeuPan
    from neupan_tpu.lon import LONTuner

    base = os.path.join(repo, "examples", "corridor", "diff")
    planner = NeuPan.init_from_yaml(os.path.join(base, "planner.yaml"))
    planner.stuck_enabled = False  # LON owns stuck handling via its loss

    class FrozenTuner:
        def update(self, adjust, grads):
            return adjust

    # episode loss with the INITIAL parameters (no updates)
    losses0, _ = run_episode(planner, FrozenTuner(), base)
    loss0 = float(np.sum(losses0))
    assert loss0 > 0.0, "fixture episode must exercise the loss"

    # tuning epochs with a frozen replay after each (recorded trajectories
    # reach the basin by epoch ~2; 3 epochs brackets it)
    tuner = LONTuner(planner.adjust, lr=5e-3)
    best = float("inf")
    for _ in range(3):
        run_episode(planner, tuner, base)
        losses1, _ = run_episode(planner, FrozenTuner(), base)
        best = min(best, float(np.sum(losses1)))

    # best-epoch selection must beat the initial parameters by >= 10%
    assert best < 0.9 * loss0, (best, loss0)
