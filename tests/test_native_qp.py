"""Native C++ QP solver vs the JAX solvers: independent implementations must
agree (cross-oracle validation of both)."""

import jax.numpy as jnp
import numpy as np
import pytest

from riskaversetrajopt_tpu.native.qp import solve_qp_native
from riskaversetrajopt_tpu.ops.admm import DenseQPOps
from riskaversetrajopt_tpu.ops.ipm import IPMConfig, solve_qp_ipm


def test_native_box_qp():
    n = 8
    c = np.linspace(-3, 3, n)
    P = 2 * np.eye(n)
    q = -2 * c
    A = np.eye(n)
    sol = solve_qp_native(P, q, A, -np.ones(n), np.ones(n))
    assert sol.solved
    np.testing.assert_allclose(sol.x, np.clip(c, -1, 1), atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_jax_ipm(seed):
    rng = np.random.default_rng(seed)
    n, m = 12, 20
    L = rng.standard_normal((n, n))
    P = L @ L.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    x_feas = rng.standard_normal(n) * 0.1
    l = A @ x_feas - rng.uniform(0.1, 2.0, m)
    u = A @ x_feas + rng.uniform(0.1, 2.0, m)

    nat = solve_qp_native(P, q, A, l, u, eps_abs=1e-9, eps_rel=1e-9)
    assert nat.solved

    ops = DenseQPOps(jnp.array(P), jnp.array(A))
    ipm = solve_qp_ipm(
        ops, jnp.array(q), jnp.array(l), jnp.array(u), n_eq=0,
        cfg=IPMConfig(tol=1e-9),
    )
    np.testing.assert_allclose(nat.x, np.asarray(ipm.x), atol=1e-5)


def test_native_equality_rows():
    rng = np.random.default_rng(3)
    n, me = 6, 2
    L = rng.standard_normal((n, n))
    P = L @ L.T + n * np.eye(n)
    q = rng.standard_normal(n)
    G = rng.standard_normal((me, n))
    b = rng.standard_normal(me)
    KKT = np.block([[P, G.T], [G, np.zeros((me, me))]])
    xy = np.linalg.solve(KKT, np.concatenate([-q, b]))
    sol = solve_qp_native(P, q, G, b, b, eps_abs=1e-9, eps_rel=1e-9)
    assert sol.solved
    np.testing.assert_allclose(sol.x, xy[:n], atol=1e-6)


def test_native_avar_qp_matches_closed_form():
    rng = np.random.default_rng(7)
    M, alpha = 100, 0.1
    Z = rng.standard_normal(M)
    nv = M + 1
    P = np.zeros((nv, nv))
    q = np.concatenate([np.full(M, 1.0 / (M * alpha)), [1.0]])
    A = np.zeros((2 * M, nv))
    A[:M, :M] = -np.eye(M)
    A[M:, :M] = -np.eye(M)
    A[M:, -1] = -1.0
    l = np.full(2 * M, -np.inf)
    u = np.concatenate([np.zeros(M), -Z])
    sol = solve_qp_native(P, q, A, l, u, eps_abs=1e-9, eps_rel=1e-9)
    t_risk = sol.x[-1]
    avar_native = t_risk + np.mean(np.maximum(Z - t_risk, 0.0) / alpha)
    from riskaversetrajopt_tpu.ops.cvar import avar

    np.testing.assert_allclose(
        avar_native, float(avar(jnp.asarray(Z), alpha)), atol=1e-5
    )
