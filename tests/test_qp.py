"""QP solver tests: analytic cases, a scipy trust-constr oracle, KKT checks,
batching, and implicit-diff gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import LinearConstraint, minimize

from neupan_tpu.ops.qp import ADMMConfig, QPData, solve_qp, solve_qp_batch

CFG = ADMMConfig(iters=200)


def scipy_qp_oracle(P_diag, q, A, l, u, n):
    """High-accuracy oracle via scipy trust-constr."""

    def f(x):
        return 0.5 * x @ (P_diag * x) + q @ x

    def grad(x):
        return P_diag * x + q

    con = LinearConstraint(A, l, u)
    res = minimize(
        f, np.zeros(n), jac=grad, hess=lambda x: np.diag(P_diag),
        method="trust-constr", constraints=[con],
        options={"gtol": 1e-12, "xtol": 1e-12, "maxiter": 3000},
    )
    return res.x


def test_unconstrained_analytic():
    # min 1/2 x'Px + q'x with huge box -> x = -q/P
    n = 8
    P = np.linspace(1.0, 3.0, n)
    q = np.linspace(-1.0, 1.0, n)
    A = np.eye(n)
    l = -1e4 * np.ones(n)
    u = 1e4 * np.ones(n)
    qp = QPData(*[jnp.asarray(v, dtype=jnp.float32) for v in (P, q, A, l, u)])
    sol = solve_qp(qp, CFG)
    np.testing.assert_allclose(np.asarray(sol.x), -q / P, rtol=1e-4, atol=1e-5)


def test_box_clipped_analytic():
    # min 1/2 (x - 3)^2 s.t. x <= 1  ->  x = 1, dual y = -grad = 2
    qp = QPData(
        P_diag=jnp.array([1.0]), q=jnp.array([-3.0]),
        A=jnp.array([[1.0]]), l=jnp.array([-1e4]), u=jnp.array([1.0]),
    )
    sol = solve_qp(qp, CFG)
    np.testing.assert_allclose(float(sol.x[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(sol.y[0]), 2.0, atol=1e-4)


def test_equality_constraint():
    # min 1/2||x||^2 s.t. x0 + x1 = 2 -> x = [1, 1]
    qp = QPData(
        P_diag=jnp.array([1.0, 1.0]), q=jnp.zeros(2),
        A=jnp.array([[1.0, 1.0]]), l=jnp.array([2.0]), u=jnp.array([2.0]),
    )
    sol = solve_qp(qp, CFG)
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 1.0], atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_qp_vs_scipy(seed):
    rng = np.random.default_rng(seed)
    n, m = 12, 20
    P = rng.uniform(0.5, 2.0, n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    mid = A @ rng.normal(size=n) * 0.1
    width = rng.uniform(0.5, 2.0, m)
    l, u = mid - width, mid + width
    # a couple of equality rows
    l[:2] = u[:2] = mid[:2]

    x_ref = scipy_qp_oracle(P, q, A, l, u, n)

    qp = QPData(*[jnp.asarray(v, dtype=jnp.float32) for v in (P, q, A, l, u)])
    sol = solve_qp(qp, CFG)
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, rtol=2e-3, atol=2e-4)


def test_kkt_residuals_small():
    rng = np.random.default_rng(5)
    n, m = 20, 30
    P = rng.uniform(0.1, 5.0, n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    l = A @ rng.normal(size=n) * 0.05 - 1.0
    u = l + rng.uniform(0.1, 2.0, m)
    qp = QPData(*[jnp.asarray(v, dtype=jnp.float32) for v in (P, q, A, l, u)])
    # this random dense QP converges slowly under fixed-rho ADMM and its
    # crowded near-active set defeats polish; give it a longer budget
    sol = solve_qp(qp, ADMMConfig(iters=1000))
    assert float(sol.r_prim) < 5e-4
    assert float(sol.r_dual) < 5e-4
    # primal feasibility
    Ax = np.asarray(qp.A) @ np.asarray(sol.x)
    assert np.all(Ax >= l - 5e-4) and np.all(Ax <= u + 5e-4)


def test_batch_matches_single():
    rng = np.random.default_rng(7)
    B, n, m = 4, 10, 14
    P = rng.uniform(0.5, 2.0, (B, n))
    q = rng.normal(size=(B, n))
    A = rng.normal(size=(B, m, n))
    mid = np.einsum("bmn,bn->bm", A, rng.normal(size=(B, n)) * 0.1)
    l = mid - 1.0
    u = mid + 1.0
    qp = QPData(*[jnp.asarray(v, dtype=jnp.float32) for v in (P, q, A, l, u)])
    batch_sol = solve_qp_batch(qp, CFG)
    for b in range(B):
        single = solve_qp(QPData(qp.P_diag[b], qp.q[b], qp.A[b], qp.l[b], qp.u[b]), CFG)
        np.testing.assert_allclose(
            np.asarray(batch_sol.x[b]), np.asarray(single.x), rtol=1e-5, atol=1e-6
        )


def test_implicit_gradient_matches_finite_difference():
    # Differentiate the solution w.r.t. a parameter entering q.
    n = 6
    P = jnp.ones(n) * 2.0
    A = jnp.asarray(np.eye(n), dtype=jnp.float32)
    l = -jnp.ones(n) * 0.5
    u = jnp.ones(n) * 0.5
    target = jnp.asarray(np.linspace(-1, 1, n), dtype=jnp.float32)

    def loss(theta):
        q = -2.0 * theta * target  # q depends on theta
        sol = solve_qp(QPData(P, q, A, l, u), CFG)
        return jnp.sum(sol.x**2)

    g = jax.grad(loss)(jnp.asarray(0.7))
    eps = 1e-3
    fd = (loss(jnp.asarray(0.7 + eps)) - loss(jnp.asarray(0.7 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=5e-2, atol=1e-4)


def test_soft_row_analytic():
    # min 0.5 x^2 - 3x + 0.5*w*neg(x - 5)^2  ->  x = (3 + 5w)/(1 + w)
    for w in (0.5, 2.0, 50.0):
        qp = QPData(
            P_diag=jnp.array([1.0]), q=jnp.array([-3.0]),
            A=jnp.array([[1.0]]), l=jnp.array([5.0]), u=jnp.array([1e20]),
            soft=jnp.array([w]),
        )
        sol = solve_qp(qp, CFG)
        want = (3 + 5 * w) / (1 + w)
        np.testing.assert_allclose(float(sol.x[0]), want, atol=1e-4)
        # dual = penalty gradient w*(x - 5) < 0
        np.testing.assert_allclose(float(sol.y[0]), w * (want - 5), atol=1e-3)


def test_soft_row_inactive():
    # min 0.5 (x - 3)^2 with soft row x >= 1: inactive -> x = 3, y = 0
    qp = QPData(
        P_diag=jnp.array([1.0]), q=jnp.array([-3.0]),
        A=jnp.array([[1.0]]), l=jnp.array([1.0]), u=jnp.array([1e20]),
        soft=jnp.array([10.0]),
    )
    sol = solve_qp(qp, CFG)
    np.testing.assert_allclose(float(sol.x[0]), 3.0, atol=1e-4)
    np.testing.assert_allclose(float(sol.y[0]), 0.0, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_soft_rows_match_slack_reformulation(seed):
    """Soft penalty rows must equal the explicit-slack reformulation."""
    rng = np.random.default_rng(seed)
    n, m_h, m_s = 10, 8, 6
    P = rng.uniform(0.5, 2.0, n)
    q = rng.normal(size=n)
    Ah = rng.normal(size=(m_h, n))
    mid = Ah @ rng.normal(size=n) * 0.1
    lh, uh = mid - 1.0, mid + 1.0
    lh[:2] = uh[:2] = mid[:2]
    As = rng.normal(size=(m_s, n))
    ls = As @ rng.normal(size=n) * 0.1 + rng.uniform(-0.5, 0.5, m_s)
    w = rng.uniform(5.0, 50.0, m_s)

    A = np.vstack([Ah, As])
    l = np.concatenate([lh, ls])
    u = np.concatenate([uh, np.full(m_s, 1e20)])
    soft = np.concatenate([np.zeros(m_h), w])
    qp1 = QPData(*[jnp.asarray(v, jnp.float32) for v in (P, q, A, l, u)],
                 soft=jnp.asarray(soft, jnp.float32))
    s1 = solve_qp(qp1, CFG)

    # slack form: vars [x, z]; obj += 0.5 w z^2; As x + z >= ls, z >= 0
    n2 = n + m_s
    P2 = np.concatenate([P, w])
    q2 = np.concatenate([q, np.zeros(m_s)])
    A2 = np.zeros((m_h + 2 * m_s, n2))
    A2[:m_h, :n] = Ah
    A2[m_h:m_h + m_s, :n] = As
    A2[m_h:m_h + m_s, n:] = np.eye(m_s)
    A2[m_h + m_s:, n:] = np.eye(m_s)
    l2 = np.concatenate([lh, ls, np.zeros(m_s)])
    u2 = np.concatenate([uh, np.full(2 * m_s, 1e20)])
    qp2 = QPData(*[jnp.asarray(v, jnp.float32) for v in (P2, q2, A2, l2, u2)])
    s2 = solve_qp(qp2, CFG)

    np.testing.assert_allclose(
        np.asarray(s1.x), np.asarray(s2.x)[:n], rtol=1e-3, atol=2e-4)


def test_soft_row_gradient_matches_finite_difference():
    # grads w.r.t. the soft target l (the NRMP fb path used by LON losses):
    # min 0.5||x||^2 + 0.5*20*neg(sum x - 6 theta)^2 has the closed form
    # x_i = 6*20*theta/(1 + 4*20), so d(sum x^2)/d theta is analytic.
    n = 4
    P = jnp.ones(n)
    q = jnp.zeros(n)
    A = jnp.asarray(np.vstack([np.eye(n), np.ones((1, n))]), jnp.float32)
    u = jnp.asarray(np.concatenate([10 * np.ones(n), [1e20]]), jnp.float32)
    soft = jnp.asarray(np.concatenate([np.zeros(n), [20.0]]), jnp.float32)
    w = 20.0

    def loss(theta):
        l = jnp.concatenate([-10 * jnp.ones(n), 6.0 * theta[None]])
        sol = solve_qp(QPData(P, q, A, u=u, l=l, soft=soft), CFG)
        return jnp.sum(sol.x ** 2)

    theta0 = 1.2
    g = jax.grad(loss)(jnp.asarray(theta0))
    c = 6 * w * theta0 / (1 + n * w)
    analytic = 2 * n * c * (6 * w / (1 + n * w))
    eps = 1e-3
    fd = (loss(jnp.asarray(theta0 + eps)) - loss(jnp.asarray(theta0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), analytic, rtol=1e-3)
    np.testing.assert_allclose(float(g), float(fd), rtol=5e-2)


def test_warm_start_accepted():
    qp = QPData(
        P_diag=jnp.array([1.0, 1.0]), q=jnp.array([-1.0, -1.0]),
        A=jnp.asarray(np.eye(2), dtype=jnp.float32),
        l=jnp.array([-10.0, -10.0]), u=jnp.array([10.0, 10.0]),
    )
    sol0 = solve_qp(qp, CFG)
    sol1 = solve_qp(qp, ADMMConfig(iters=10), x0=sol0.x, y0=sol0.y)
    np.testing.assert_allclose(np.asarray(sol1.x), np.asarray(sol0.x), atol=1e-4)
