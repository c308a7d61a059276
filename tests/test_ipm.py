"""Interior-point QP solver tests: closed forms, SLSQP cross-checks, and
agreement with the ADMM backend on the structured SAA subproblem."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from riskaversetrajopt_tpu.core.config import SolverConfig
from riskaversetrajopt_tpu.ops.admm import DenseQPOps
from riskaversetrajopt_tpu.ops.ipm import IPMConfig, solve_qp_ipm
from riskaversetrajopt_tpu.ops.saa_qp import (
    SAAQPOps,
    build_bounds,
    build_objective,
)
from tests.test_saa_qp import make_problem


def dense_ipm(P, q, A, l, u, n_eq, cfg=IPMConfig()):
    ops = DenseQPOps(jnp.array(P), jnp.array(A), kkt_refine_iters=1)
    return solve_qp_ipm(ops, jnp.array(q), jnp.array(l), jnp.array(u), n_eq, cfg)


def test_box_qp_closed_form():
    n = 8
    c = np.linspace(-3, 3, n)
    P = 2 * np.eye(n)
    q = -2 * c
    A = np.eye(n)
    sol = dense_ipm(P, q, A, -np.ones(n), np.ones(n), n_eq=0)
    assert bool(sol.solved)
    np.testing.assert_allclose(np.asarray(sol.x), np.clip(c, -1, 1), atol=1e-7)


def test_equality_constrained_qp():
    rng = np.random.default_rng(0)
    n, me = 6, 2
    L = rng.standard_normal((n, n))
    P = L @ L.T + n * np.eye(n)
    q = rng.standard_normal(n)
    G = rng.standard_normal((me, n))
    b = rng.standard_normal(me)
    KKT = np.block([[P, G.T], [G, np.zeros((me, me))]])
    xy = np.linalg.solve(KKT, np.concatenate([-q, b]))
    # add a loose box so there are some inequality rows too
    A = np.vstack([G, np.eye(n)])
    l = np.concatenate([b, np.full(n, -100.0)])
    u = np.concatenate([b, np.full(n, 100.0)])
    sol = dense_ipm(P, q, A, l, u, n_eq=me)
    assert bool(sol.solved)
    np.testing.assert_allclose(np.asarray(sol.x), xy[:n], atol=1e-6)
    # equality duals match the KKT multipliers
    np.testing.assert_allclose(np.asarray(sol.y[:me]), xy[n:], atol=1e-5)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_inequality_qp_vs_slsqp(seed):
    rng = np.random.default_rng(seed)
    n, m = 10, 16
    L = rng.standard_normal((n, n))
    P = L @ L.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    x_feas = rng.standard_normal(n) * 0.1
    l = A @ x_feas - rng.uniform(0.1, 2.0, m)
    u = A @ x_feas + rng.uniform(0.1, 2.0, m)
    sol = dense_ipm(P, q, A, l, u, n_eq=0)
    assert bool(sol.solved)
    res = minimize(
        lambda x: 0.5 * x @ P @ x + q @ x,
        x_feas,
        jac=lambda x: P @ x + q,
        constraints=[
            {"type": "ineq", "fun": lambda x: u - A @ x, "jac": lambda x: -A},
            {"type": "ineq", "fun": lambda x: A @ x - l, "jac": lambda x: A},
        ],
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-12},
    )
    obj = 0.5 * np.asarray(sol.x) @ P @ np.asarray(sol.x) + q @ np.asarray(sol.x)
    assert obj <= res.fun + 1e-6
    Ax = A @ np.asarray(sol.x)
    assert np.all(Ax <= u + 1e-6) and np.all(Ax >= l - 1e-6)


def test_one_sided_rows():
    # min x^2 s.t. x >= 1 (lower-only) and x <= 10 (upper-only)
    P = np.array([[2.0]])
    q = np.array([0.0])
    A = np.array([[1.0], [1.0]])
    l = np.array([1.0, -np.inf])
    u = np.array([np.inf, 10.0])
    sol = dense_ipm(P, q, A, l, u, n_eq=0)
    assert bool(sol.solved)
    np.testing.assert_allclose(np.asarray(sol.x), [1.0], atol=1e-7)
    # active lower bound has negative dual (OSQP sign convention)
    assert float(sol.y[0]) < -1.0


def test_saa_qp_ipm_high_accuracy():
    """IPM on the structured SAA subproblem reaches tight KKT accuracy where
    ADMM stalls (the motivation for the IPM backend)."""
    from tests.test_saa_qp import dense_reference_A

    st, data = make_problem()
    scp_iter = jnp.asarray(3)
    ops = SAAQPOps(st, data, scp_iter)
    p_diag, q = build_objective(st, data)
    l, u = build_bounds(st, data, scp_iter)
    sol = solve_qp_ipm(ops, q, l, u, n_eq=st.n_fc, cfg=IPMConfig(tol=1e-5))
    assert bool(sol.solved)
    assert int(sol.iters) < 50

    # true KKT residuals against the dense construction
    A, ld, ud = dense_reference_A(st, data, 3)
    x, y = np.asarray(sol.x), np.asarray(sol.y)
    Ax = A @ x
    assert np.max(Ax - ud) < 1e-6
    assert np.max(ld - Ax) < 1e-6
    # stationarity relative to the (large, degenerate) multiplier scale
    dual = np.max(np.abs(np.asarray(p_diag) * x + np.asarray(q) + A.T @ y))
    d_scale = max(np.max(np.abs(A.T @ y)), np.max(np.abs(q)))
    assert dual / d_scale < 1e-4

    # cross-check with the dense IPM path: same objective value
    sol_d = dense_ipm(
        np.diag(np.asarray(p_diag)), np.asarray(q), A, ld, ud, n_eq=st.n_fc,
        cfg=IPMConfig(tol=1e-5),
    )
    assert bool(sol_d.solved)
    xd = np.asarray(sol_d.x)
    obj = lambda v: 0.5 * np.sum(np.asarray(p_diag) * v * v) + np.asarray(q) @ v
    assert obj(x) == pytest.approx(obj(xd), rel=1e-4)
