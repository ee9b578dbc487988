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


def test_select_topk_kernel_matches_xla_ranking():
    """Fused select kernel (interpret mode) ranks like the XLA exact path."""
    from neupan_tpu.ops.dune import signed_polygon_distance
    from neupan_tpu.ops.pallas.select import select_topk_pallas
    from neupan_tpu.robot import Robot

    robot = Robot.create(receding=4, step_time=0.1, kinematics="diff",
                         max_speed=[8, 1], max_acce=[8, 3],
                         length=1.6, width=2.0)
    G = jnp.asarray(robot.G, jnp.float32)
    h = jnp.asarray(robot.h, jnp.float32)
    V = jnp.asarray(robot.vertices, jnp.float32)
    rng = np.random.default_rng(0)
    Tp1, P, K = 5, 256, 6
    pf = jnp.asarray(rng.uniform(-8, 8, (Tp1, 2, P)), jnp.float32)
    mask = jnp.asarray(np.arange(P) < 200)

    keys, idx = select_topk_pallas(pf, mask, V, G, h, K, interpret=True)

    d = signed_polygon_distance(V, G, h, pf)
    md = np.where(np.asarray(mask)[None], np.asarray(d), 1e9)
    idx_ref = np.argsort(md, axis=1, kind="stable")[:, :K]
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)
    # keys ascending, valid flags correct
    k_np = np.asarray(keys)
    assert np.all(np.diff(k_np, axis=1) >= 0)
    assert np.all(k_np < 5e8)


def test_select_topk_kernel_masked_slots():
    from neupan_tpu.ops.pallas.select import select_topk_pallas
    from neupan_tpu.robot import Robot

    robot = Robot.create(receding=2, step_time=0.1, kinematics="diff",
                         max_speed=[8, 1], max_acce=[8, 3],
                         length=1.0, width=1.0)
    G = jnp.asarray(robot.G, jnp.float32)
    h = jnp.asarray(robot.h, jnp.float32)
    V = jnp.asarray(robot.vertices, jnp.float32)
    P = 128
    pf = jnp.asarray(np.random.default_rng(1).uniform(-5, 5, (3, 2, P)),
                     jnp.float32)
    mask = jnp.asarray(np.arange(P) < 3)
    keys, idx = select_topk_pallas(pf, mask, V, G, h, 5, interpret=True)
    valid = np.asarray(keys) < 5e8
    assert valid[:, :3].all() and not valid[:, 3:].any()
    assert np.asarray(idx)[:, :3].max() < 3


def test_select_topk_kernel_grad_through_gather():
    """LON differentiates through pan_forward; the kernel itself has no
    linearization rule, so ops/dune.py evaluates it under stop_gradient
    and lets gradients flow through the downstream gathers.  This mirrors
    that usage: grad must not raise, and must be nonzero only at the
    selected columns (regression for the LON-on-TPU autodiff crash)."""
    import jax

    from neupan_tpu.ops.pallas.select import select_topk_pallas
    from neupan_tpu.robot import Robot

    robot = Robot.create(receding=3, step_time=0.1, kinematics="diff",
                         max_speed=[8, 1], max_acce=[8, 3],
                         length=1.6, width=2.0)
    G = jnp.asarray(robot.G, jnp.float32)
    h = jnp.asarray(robot.h, jnp.float32)
    V = jnp.asarray(robot.vertices, jnp.float32)
    rng = np.random.default_rng(2)
    Tp1, P, K = 4, 128, 5
    pf = jnp.asarray(rng.uniform(-8, 8, (Tp1, 2, P)), jnp.float32)
    mask = jnp.asarray(np.ones(P, bool))

    def loss(pf):
        _, idx = select_topk_pallas(jax.lax.stop_gradient(pf), mask, V,
                                    G, h, K, interpret=True)
        pf_k = jax.vmap(lambda arr, i: arr[:, i])(pf, idx)
        return jnp.sum(pf_k ** 2)

    g = jax.grad(loss)(pf)
    nz = np.count_nonzero(np.asarray(g))
    assert 0 < nz <= Tp1 * 2 * K


def test_sweep_inverse_matches_f64_and_gj():
    """Batched sweep-operator inverse (interpret mode) == f64 inverse ==
    the XLA Gauss-Jordan it replaces on the TPU batched path."""
    from neupan_tpu.ops.pallas.sweep import sweep_spd_inverse
    from neupan_tpu.ops import qp as qp_mod

    rng = np.random.default_rng(0)
    for B, n in [(4, 30), (130, 18), (7, 33)]:
        Q = rng.normal(size=(B, n, n))
        M = Q @ np.swapaxes(Q, 1, 2) / n + np.eye(n)[None]
        dj = 1 / np.sqrt(np.abs(np.einsum("bii->bi", M)))
        Mt = M * dj[:, :, None] * dj[:, None, :] + 1e-7 * np.eye(n)[None]
        Mt32 = jnp.asarray(Mt, jnp.float32)
        X = np.asarray(sweep_spd_inverse(Mt32, interpret=True))
        assert X.shape == (B, n, n)
        X64 = np.linalg.inv(Mt)
        rel = np.abs(X - X64).max() / np.abs(X64).max()
        assert rel < 3e-5, (B, n, rel)
        Xgj = np.asarray(qp_mod._gj_inverse_scaled(Mt32))
        np.testing.assert_allclose(X, Xgj, rtol=1e-4, atol=1e-5)


def test_sweep_inverse_stiff_nrmp_matrix():
    """The sweep path must match the GJ path on the real rho_eq-stiffened
    condensed NRMP normal matrices (the production input)."""
    from neupan_tpu.ops.pallas.sweep import sweep_spd_inverse
    from neupan_tpu.ops import qp as qp_mod
    from tests.test_qp_condensed import (layout_cfg, make_flagship_instance,
                                         _condensed_normal_matrix)

    Ms = []
    for seed in range(3):
        spec, qp, elim, _ = make_flagship_instance(seed, contact=True)
        cfg = layout_cfg(spec)
        with jax.default_matmul_precision("highest"):
            Ms.append(_condensed_normal_matrix(spec, qp, elim, cfg))
    M = jnp.stack(Ms)
    n = M.shape[-1]
    dj = jax.lax.rsqrt(jnp.abs(jnp.diagonal(M, axis1=-2, axis2=-1)) + 1e-30)
    Mt = M * dj[:, :, None] * dj[:, None, :] + 1e-7 * jnp.eye(n)
    with jax.default_matmul_precision("highest"):
        Xs = np.asarray(sweep_spd_inverse(Mt, interpret=True))
        Xg = np.asarray(qp_mod._gj_inverse_scaled(Mt))
    resid = np.abs(np.einsum("bij,bjk->bik", np.asarray(Mt, np.float64),
                             Xs) - np.eye(n)).max()
    assert resid < 5e-4, resid
    np.testing.assert_allclose(Xs, Xg, rtol=1e-3, atol=1e-4)


def test_fused_admm_iterate_matches_xla_loop():
    """The fused ADMM iteration kernel (interpret mode) must reproduce the
    XLA phase loop it replaces: w/z to f32 tightness, y to the relative
    level set by 50 iterations of reordered f32 accumulation (the ADMM
    dual is only a polish seed; the polish re-derives duals exactly)."""
    import unittest.mock as mock

    import neupan_tpu.ops.pallas.admm as AD
    import neupan_tpu.ops.pallas.sweep as SW
    from neupan_tpu.ops import qp as Q
    from neupan_tpu.ops.qp import ADMMConfig, _condensed_phases_single

    rng = np.random.default_rng(0)
    B, m, k = 16, 148, 30
    Hs = rng.normal(size=(B, k, k))
    Hs = Hs @ np.swapaxes(Hs, 1, 2) / k + np.eye(k)
    As = rng.normal(size=(B, m, k)) * 0.3
    qs = rng.normal(size=(B, k))
    ls = rng.normal(size=(B, m)) - 1
    us = ls + np.abs(rng.normal(size=(B, m))) + 0.5
    soft = np.where(rng.uniform(size=(B, m)) < 0.5, 10.0, 0.0)
    us = np.where(soft > 0, 1e20, us)
    w0 = rng.normal(size=(B, k)) * 0.1
    y0 = rng.normal(size=(B, m)) * 0.1
    args = [jnp.asarray(a, jnp.float32)
            for a in (Hs, qs, As, ls, us, soft, w0, y0)]
    cfg = ADMMConfig(iters=50, rho_updates=1)

    orig_it, orig_sw = AD.admm_iterate, SW.sweep_spd_inverse
    AD.admm_iterate = lambda *a, **kw: orig_it(*a, **{**kw, "interpret": True})
    SW.sweep_spd_inverse = lambda M, interpret=False: orig_sw(M,
                                                              interpret=True)
    try:
        with jax.default_matmul_precision("highest"):
            ref = jax.vmap(
                lambda *a: _condensed_phases_single(cfg, True, *a))(*args)
            with mock.patch.object(jax, "default_backend", lambda: "tpu"):
                out = Q._condensed_phases_batched(cfg, True, *args)
    finally:
        AD.admm_iterate, SW.sweep_spd_inverse = orig_it, orig_sw

    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(ref[2]),
                               rtol=1e-2, atol=1e-3)


def test_fused_flow_dune_matches_materialized_exact():
    """dune_forward_flow (in-kernel point flow, interpret mode) must select
    the SAME point sets as the materialized exact path and produce the
    same per-point quantities.  Slot ORDER differs by design: the fused
    path keeps the kernel's exact-distance order while the materialized
    path re-sorts by learned distance (see dune_forward_flow) — the NRMP
    problem is slot-order invariant, so the comparison aligns slots by
    selected index."""
    import functools

    import neupan_tpu.ops.pallas.select as SEL
    from neupan_tpu.models import obs_point_net
    from neupan_tpu.ops.dune import (dune_forward, dune_forward_flow,
                                     generate_point_flow)
    from neupan_tpu.robot import Robot

    orig = SEL.select_topk_flow_pallas
    SEL.select_topk_flow_pallas = functools.partial(orig, interpret=True)
    try:
        rng = np.random.default_rng(0)
        T, K, P = 10, 10, 300
        robot = Robot.create(receding=T, step_time=0.1, kinematics="diff",
                             max_speed=[8, 1], max_acce=[8, 3], length=1.6,
                             width=2.0)
        params = obs_point_net.init_params(jax.random.PRNGKey(0), 2,
                                           robot.edge_dim)
        G = jnp.asarray(robot.G, jnp.float32)
        h = jnp.asarray(robot.h, jnp.float32)
        verts = jnp.asarray(robot.vertices, jnp.float32)
        nom_u = jnp.asarray(rng.uniform(-0.5, 0.5, (2, T)), jnp.float32)
        nom_s = robot.rollout(jnp.zeros(3), nom_u)
        pts = jnp.asarray(rng.uniform(-5, 8, (2, P)), jnp.float32)
        vels = jnp.asarray(rng.normal(scale=0.3, size=(2, P)), jnp.float32)
        mask = jnp.asarray(rng.uniform(size=P) < 0.9)
        with jax.default_matmul_precision("highest"):
            pf, R_all, glob = generate_point_flow(nom_s, pts, vels, robot.dt)
            ref = dune_forward(params, G, h, pf, R_all, glob, mask, K,
                               select="exact", vertices=verts)
            out = dune_forward_flow(params, G, h, pts, vels, mask, nom_s,
                                    robot.dt, K, verts)
    finally:
        SEL.select_topk_flow_pallas = orig

    assert float(out.min_distance) == pytest.approx(
        float(ref.min_distance), abs=1e-5)
    # align slots by the world coordinates of the selected points
    for t in range(T + 1):
        ref_pts = np.asarray(ref.points_k)[t]      # (2, K)
        out_pts = np.asarray(out.points_k)[t]
        perm = []
        for kk in range(K):
            d = np.abs(ref_pts - out_pts[:, kk:kk + 1]).sum(axis=0)
            j = int(np.argmin(d))
            assert d[j] < 1e-5, (t, kk, d[j])      # same selected SET
            perm.append(j)
        assert sorted(perm) == list(range(K))      # a true permutation
        np.testing.assert_allclose(np.asarray(out.mu_k)[t],
                                   np.asarray(ref.mu_k)[t][:, perm],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.lam_k)[t],
                                   np.asarray(ref.lam_k)[t][:, perm],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.dist_k)[t],
                                   np.asarray(ref.dist_k)[t][perm],
                                   atol=1e-5)


def test_fused_box_candidate_matches_xla():
    """The fused polish-candidate kernel (interpret mode) must reproduce
    the XLA candidate solve (masked-Hessian + Schur inverses, KKT solve,
    reduced-space refinement) to f32 tightness."""
    import neupan_tpu.ops.pallas.polish as PK
    from neupan_tpu.ops import qp as Q

    rng = np.random.default_rng(0)
    B, k, na, refine = 9, 30, 18, 7
    Qm = rng.normal(size=(B, k, k))
    Hr = Qm @ np.swapaxes(Qm, 1, 2) / k + np.eye(k)
    Hr_ref = Hr - 1e-6 * np.eye(k)
    DAn = rng.normal(size=(B, na, k)) * 0.3
    d = (rng.uniform(size=(B, na)) < 0.6).astype(np.float64)
    DAn = DAn / np.maximum(np.linalg.norm(DAn, axis=2, keepdims=True),
                           1e-8) * d[:, :, None]
    C0 = rng.normal(size=(B, k))
    g1r = rng.normal(size=(B, k))
    g2n = rng.normal(size=(B, na)) * d
    fix = (rng.uniform(size=(B, k)) < 0.4).astype(np.float64)
    b_box = rng.normal(size=(B, k)) * fix
    args = [jnp.asarray(a, jnp.float32)
            for a in (Hr, Hr_ref, DAn, C0, g1r, g2n, b_box, fix, d)]
    with jax.default_matmul_precision("highest"):
        ref = jax.vmap(lambda *a: Q._box_candidate_single(refine, *a))(*args)
        out = PK.box_candidate(*args, refine=refine, interpret=True)
    for r, o in zip(ref, out):
        r, o = np.asarray(r), np.asarray(o)
        assert np.abs(r - o).max() / max(np.abs(r).max(), 1e-9) < 2e-4
