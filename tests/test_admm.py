"""ADMM QP solver tests: KKT-condition verification, cross-checks against
closed-form solutions and scipy SLSQP on random dense problems, warm-start
behavior, and the equality/loose-row penalty classification."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from riskaversetrajopt_tpu.core.config import SolverConfig
from riskaversetrajopt_tpu.ops.admm import rho_vector, solve_dense_qp

CFG = SolverConfig(eps_abs=1e-8, eps_rel=1e-8, max_iter=20000)


def check_kkt(P, q, A, l, u, sol, tol=1e-6):
    x, y = np.asarray(sol.x), np.asarray(sol.y)
    Ax = A @ x
    # primal feasibility
    assert np.all(Ax <= u + tol), f"primal ub violated: {np.max(Ax - u)}"
    assert np.all(Ax >= l - tol), f"primal lb violated: {np.max(l - Ax)}"
    # stationarity
    r = P @ x + q + A.T @ y
    assert np.max(np.abs(r)) < tol, f"stationarity: {np.max(np.abs(r))}"
    # complementarity / sign conditions
    for i in range(len(y)):
        if y[i] > tol:  # upper bound active
            assert Ax[i] > u[i] - 1e-4
        elif y[i] < -tol:  # lower bound active
            assert Ax[i] < l[i] + 1e-4


def test_box_qp_closed_form():
    # min (x - c)^2 s.t. -1 <= x <= 1 elementwise => x* = clip(c, -1, 1)
    n = 8
    c = np.linspace(-3, 3, n)
    P = 2 * np.eye(n)
    q = -2 * c
    A = np.eye(n)
    l, u = -np.ones(n), np.ones(n)
    sol = solve_dense_qp(
        jnp.array(P), jnp.array(q), jnp.array(A), jnp.array(l), jnp.array(u), CFG
    )
    assert bool(sol.solved)
    np.testing.assert_allclose(np.asarray(sol.x), np.clip(c, -1, 1), atol=1e-6)
    check_kkt(P, q, A, l, u, sol)


def test_equality_constrained_qp_closed_form():
    # min 1/2 x^T P x + q^T x s.t. Gx = b -> KKT linear system
    rng = np.random.default_rng(0)
    n, me = 6, 2
    L = rng.standard_normal((n, n))
    P = L @ L.T + n * np.eye(n)
    q = rng.standard_normal(n)
    G = rng.standard_normal((me, n))
    b = rng.standard_normal(me)
    KKT = np.block([[P, G.T], [G, np.zeros((me, me))]])
    xy = np.linalg.solve(KKT, np.concatenate([-q, b]))
    x_star = xy[:n]
    sol = solve_dense_qp(
        jnp.array(P), jnp.array(q), jnp.array(G), jnp.array(b), jnp.array(b), CFG
    )
    assert bool(sol.solved)
    np.testing.assert_allclose(np.asarray(sol.x), x_star, atol=1e-6)


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

    sol = solve_dense_qp(
        jnp.array(P), jnp.array(q), jnp.array(A), jnp.array(l), jnp.array(u), CFG
    )
    assert bool(sol.solved)
    check_kkt(P, q, A, l, u, sol, tol=1e-5)

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
    obj_admm = 0.5 * np.asarray(sol.x) @ P @ np.asarray(sol.x) + q @ np.asarray(sol.x)
    assert obj_admm <= res.fun + 1e-5


def test_loose_rows_and_infinite_bounds():
    # rows with (-inf, inf) bounds must not disturb the solution
    n = 4
    P = 2 * np.eye(n)
    q = -2 * np.arange(1.0, n + 1)
    A = np.vstack([np.eye(n), np.ones((1, n))])
    l = np.concatenate([np.full(n, -np.inf), [-np.inf]])
    u = np.concatenate([np.full(n, np.inf), [np.inf]])
    sol = solve_dense_qp(
        jnp.array(P), jnp.array(q), jnp.array(A), jnp.array(l), jnp.array(u), CFG
    )
    assert bool(sol.solved)
    np.testing.assert_allclose(np.asarray(sol.x), np.arange(1.0, n + 1), atol=1e-6)


def test_rho_vector_classification():
    l = jnp.array([0.0, -jnp.inf, -1.0])
    u = jnp.array([0.0, jnp.inf, 1.0])
    rv = np.asarray(rho_vector(l, u, 0.1))
    assert rv[0] == pytest.approx(100.0)  # equality: 1e3 * rho
    assert rv[1] == pytest.approx(1e-6)  # loose
    assert rv[2] == pytest.approx(0.1)  # inequality


def test_warm_start_reduces_iterations():
    rng = np.random.default_rng(5)
    n, m = 20, 40
    L = rng.standard_normal((n, n))
    P = jnp.array(L @ L.T + np.eye(n))
    q = jnp.array(rng.standard_normal(n))
    A = jnp.array(rng.standard_normal((m, n)))
    l = jnp.array(A @ rng.standard_normal(n) * 0.0 - 1.0)
    u = -l
    cfg = SolverConfig(eps_abs=1e-9, eps_rel=1e-9, max_iter=20000, adaptive_rho=False)
    cold = solve_dense_qp(P, q, A, l, u, cfg)
    warm = solve_dense_qp(P, q, A, l, u, cfg, x0=cold.x, y0=cold.y)
    assert int(warm.iters) <= int(cold.iters)
    assert int(warm.iters) <= cfg.check_every  # already at the solution


def test_avar_estimation_qp():
    """The AVaR-estimation QP (car/driving.py:639-671): with P = 0 this is an
    LP solved as a QP; its optimum t* is the alpha-VaR and the recovered AVaR
    must match the closed-form sorted-tail estimator."""
    rng = np.random.default_rng(7)
    M, alpha = 200, 0.1
    Z = rng.standard_normal(M)
    nv = M + 1
    P = np.zeros((nv, nv))
    q = np.concatenate([np.full(M, 1.0 / (M * alpha)), [1.0]])
    A = np.zeros((2 * M, nv))
    l = np.full(2 * M, -np.inf)
    u = np.zeros(2 * M)
    A[:M, :M] = -np.eye(M)
    u[M:] = -Z
    A[M:, :M] = -np.eye(M)
    A[M:, -1] = -1.0
    sol = solve_dense_qp(
        jnp.array(P), jnp.array(q), jnp.array(A), jnp.array(l), jnp.array(u), CFG
    )
    t_risk = float(sol.x[-1])
    avar_qp = t_risk + np.mean(np.maximum(Z - t_risk, 0.0) / alpha)
    # closed-form: AVaR_alpha = mean of the alpha-tail
    Zs = np.sort(Z)[::-1]
    k = int(np.floor(M * alpha))
    var_cf = Zs[k]
    avar_cf = var_cf + np.mean(np.maximum(Z - var_cf, 0.0)) / alpha
    assert avar_qp == pytest.approx(avar_cf, abs=1e-4)


def test_primal_infeasibility_certificate():
    """x >= 1 and x <= 0 simultaneously: OSQP-style primal infeasibility
    certificate must fire instead of grinding to max_iter."""
    P = jnp.zeros((1, 1))
    q = jnp.zeros(1)
    A = jnp.array([[1.0], [1.0]])
    l = jnp.array([1.0, -jnp.inf])
    u = jnp.array([jnp.inf, 0.0])
    sol = solve_dense_qp(P, q, A, l, u, SolverConfig(max_iter=4000, polish=False))
    assert bool(sol.prim_infeasible)
    assert not bool(sol.solved)


def test_dual_infeasibility_certificate():
    """min -x s.t. x >= 0: unbounded below -> dual infeasibility
    certificate."""
    P = jnp.zeros((1, 1))
    q = jnp.array([-1.0])
    A = jnp.array([[1.0]])
    l = jnp.array([0.0])
    u = jnp.array([jnp.inf])
    sol = solve_dense_qp(P, q, A, l, u, SolverConfig(max_iter=4000, polish=False))
    assert bool(sol.dual_infeasible)
    assert not bool(sol.solved)


def test_f32_polish_recovers_tight_kkt():
    """f32 polish regression (VERDICT weak #9): with loosely-converged f32
    ADMM iterates, the duals of weakly-active rows sit near f32 roundoff
    (~1e-7) where a pure dual-sign active-set test under-selects; the
    proximity rescue in ops/admm.py:_polish must still select them so the
    polished solution lands near the exact active-set solution (OSQP polish
    semantics, osqp/src/polish.c equivalent)."""
    rng = np.random.default_rng(7)
    n, m = 10, 16
    L = rng.standard_normal((n, n))
    P = (L @ L.T + 0.5 * np.eye(n)).astype(np.float32)
    q = rng.standard_normal(n).astype(np.float32)
    A = rng.standard_normal((m, n)).astype(np.float32)
    x_feas = (rng.standard_normal(n) * 0.1).astype(np.float32)
    l = A @ x_feas - rng.uniform(0.1, 2.0, m).astype(np.float32)
    u = A @ x_feas + rng.uniform(0.1, 2.0, m).astype(np.float32)

    # exact solution in f64 for the error metric
    sol64 = solve_dense_qp(
        jnp.asarray(P, jnp.float64), jnp.asarray(q, jnp.float64),
        jnp.asarray(A, jnp.float64), jnp.asarray(l, jnp.float64),
        jnp.asarray(u, jnp.float64), CFG,
    )
    x_star = np.asarray(sol64.x)

    cfg32 = SolverConfig(eps_abs=1e-4, eps_rel=1e-4, max_iter=4000,
                         polish=True)
    cfg32_np = SolverConfig(eps_abs=1e-4, eps_rel=1e-4, max_iter=4000,
                            polish=False)
    mk = lambda z: jnp.asarray(z, jnp.float32)
    sol_pol = solve_dense_qp(mk(P), mk(q), mk(A), mk(l), mk(u), cfg32)
    sol_nop = solve_dense_qp(mk(P), mk(q), mk(A), mk(l), mk(u), cfg32_np)
    assert sol_pol.x.dtype == jnp.float32
    err_pol = np.linalg.norm(np.asarray(sol_pol.x) - x_star)
    err_nop = np.linalg.norm(np.asarray(sol_nop.x) - x_star)
    # polish must tighten the loose-eps iterate to near-f32-exact ...
    assert err_pol < 5e-5, f"polished f32 error {err_pol:.2e}"
    # ... and strictly beat the unpolished iterate
    assert err_pol <= err_nop


def test_check_backoff_solves_same_solution():
    """check_backoff_max > 1 (geometric termination-check interval while far
    from tolerance) must reach the same certified solution; iteration count
    may differ only by later detection."""
    rng = np.random.default_rng(7)
    n, m = 20, 40
    L = rng.standard_normal((n, n))
    P = jnp.asarray(L @ L.T + 0.1 * np.eye(n))
    A = jnp.asarray(rng.standard_normal((m, n)))
    q = jnp.asarray(rng.standard_normal(n))
    l = jnp.asarray(-1.0 - rng.random(m))
    u = jnp.asarray(1.0 + rng.random(m))
    base = solve_dense_qp(P, q, A, l, u, SolverConfig(
        eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, polish=False))
    back = solve_dense_qp(P, q, A, l, u, SolverConfig(
        eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, polish=False,
        check_backoff_max=8))
    assert bool(base.solved) and bool(back.solved)
    np.testing.assert_allclose(np.asarray(back.x), np.asarray(base.x),
                               rtol=1e-4, atol=1e-6)


def test_rho_epoch_cadence_solves_same_solution():
    """rho_epoch_every > 0 (fixed-cadence rho refactorization epochs, the
    vmapped-batch mode) must reach the same certified solution as the
    event-driven epoch handshake; only the rho-update timing differs."""
    rng = np.random.default_rng(11)
    n, m = 20, 40
    L = rng.standard_normal((n, n))
    P = jnp.asarray(L @ L.T + 0.1 * np.eye(n))
    A = jnp.asarray(rng.standard_normal((m, n)))
    q = jnp.asarray(rng.standard_normal(n))
    l = jnp.asarray(-1.0 - rng.random(m))
    u = jnp.asarray(1.0 + rng.random(m))
    base = solve_dense_qp(P, q, A, l, u, SolverConfig(
        eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, polish=False))
    epoch = solve_dense_qp(P, q, A, l, u, SolverConfig(
        eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, polish=False,
        rho_epoch_every=100))
    assert bool(base.solved) and bool(epoch.solved)
    np.testing.assert_allclose(np.asarray(epoch.x), np.asarray(base.x),
                               rtol=1e-4, atol=1e-6)
