"""NLP interior-point solver tests on closed-form and classic problems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riskaversetrajopt_tpu.ops.nlp_ipm import NLPConfig, solve_nlp


def test_qp_as_nlp():
    # min (x-1)^2 + (y-2)^2 s.t. x + y = 1  => x* = 0, y* = 1
    def f(Z):
        return (Z[0] - 1.0) ** 2 + (Z[1] - 2.0) ** 2

    def g(Z):
        return jnp.array([Z[0] + Z[1]])

    res = solve_nlp(
        f, g,
        g_L=jnp.array([1.0]), g_U=jnp.array([1.0]), n_eq=1,
        x_L=jnp.full(2, -1e15), x_U=jnp.full(2, 1e15),
        Z0=jnp.zeros(2),
    )
    assert bool(res.solved)
    np.testing.assert_allclose(np.asarray(res.Z), [0.0, 1.0], atol=1e-6)


def test_rosenbrock_box():
    # min rosenbrock s.t. box; unconstrained optimum (1,1) inside the box
    def f(Z):
        return 100.0 * (Z[1] - Z[0] ** 2) ** 2 + (1 - Z[0]) ** 2

    def g(Z):
        return jnp.zeros(0)

    res = solve_nlp(
        f, g,
        g_L=jnp.zeros(0), g_U=jnp.zeros(0), n_eq=0,
        x_L=jnp.array([-2.0, -2.0]), x_U=jnp.array([2.0, 2.0]),
        Z0=jnp.array([-1.2, 1.0]),
        cfg=NLPConfig(tol=1e-8, max_iter=200),
    )
    assert bool(res.solved)
    np.testing.assert_allclose(np.asarray(res.Z), [1.0, 1.0], atol=1e-5)


def test_hs071():
    """Hock-Schittkowski 71 (the IPOPT documentation example):
    min x1 x4 (x1+x2+x3) + x3
    s.t. x1 x2 x3 x4 >= 25 ; x1^2+x2^2+x3^2+x4^2 = 40 ; 1 <= x <= 5.
    Known optimum: (1.0, 4.743, 3.821, 1.379), f* = 17.014."""

    def f(Z):
        return Z[0] * Z[3] * (Z[0] + Z[1] + Z[2]) + Z[2]

    def g(Z):
        return jnp.array(
            [Z[0] ** 2 + Z[1] ** 2 + Z[2] ** 2 + Z[3] ** 2, Z[0] * Z[1] * Z[2] * Z[3]]
        )

    res = solve_nlp(
        f, g,
        g_L=jnp.array([40.0, 25.0]), g_U=jnp.array([40.0, 1e15]), n_eq=1,
        x_L=jnp.ones(4), x_U=jnp.full(4, 5.0),
        Z0=jnp.array([1.0, 5.0, 5.0, 1.0]),
        cfg=NLPConfig(tol=1e-8, max_iter=200),
    )
    assert bool(res.solved)
    np.testing.assert_allclose(
        np.asarray(res.Z), [1.0, 4.7429994, 3.8211503, 1.3794082], atol=1e-4
    )
    assert float(res.f_val) == pytest.approx(17.0140173, abs=1e-4)


def test_two_sided_rows():
    # min -x - 2y s.t. 0 <= x + y <= 1, -1 <= x - y <= 1 (LP)
    # optimum at x+y=1, x-y=-1 => x=0, y=1, f=-2
    def f(Z):
        return -Z[0] - 2.0 * Z[1]

    def g(Z):
        return jnp.array([Z[0] + Z[1], Z[0] - Z[1]])

    res = solve_nlp(
        f, g,
        g_L=jnp.array([0.0, -1.0]), g_U=jnp.array([1.0, 1.0]), n_eq=0,
        x_L=jnp.full(2, -10.0), x_U=jnp.full(2, 10.0),
        Z0=jnp.zeros(2),
        cfg=NLPConfig(tol=1e-8, max_iter=200),
    )
    assert bool(res.solved)
    np.testing.assert_allclose(np.asarray(res.Z), [0.0, 1.0], atol=1e-5)


def test_second_order_correction_maratos():
    """Maratos-effect problem (min 2(x1^2+x2^2-1) - x1 s.t. x1^2+x2^2=1):
    near the solution (1,0) the full Newton step is rejected by any merit
    function because the linearized circle constraint misses its curvature.
    The second-order correction (NLPConfig.soc, IPOPT sec 2.4) restores full
    steps; both variants must solve, and SOC must not be slower."""

    def f(Z):
        return 2.0 * (Z[0] ** 2 + Z[1] ** 2 - 1.0) - Z[0]

    def g(Z):
        return jnp.array([Z[0] ** 2 + Z[1] ** 2])

    kw = dict(
        g_L=jnp.array([1.0]), g_U=jnp.array([1.0]), n_eq=1,
        x_L=jnp.full(2, -1e15), x_U=jnp.full(2, 1e15),
        Z0=jnp.array([jnp.cos(0.5), jnp.sin(0.5)]),  # on the circle, off-optimum
    )
    base = solve_nlp(f, g, cfg=NLPConfig(tol=1e-8, max_iter=100), **kw)
    soc = solve_nlp(f, g, cfg=NLPConfig(tol=1e-8, max_iter=100, soc=True), **kw)
    for res in (base, soc):
        assert bool(res.solved)
        np.testing.assert_allclose(np.asarray(res.Z), [1.0, 0.0], atol=1e-6)
    assert int(soc.iters) <= int(base.iters)


def test_soc_no_regression_on_hopper_baseline():
    """SOC enabled must not break the hopper contact-implicit solve (the
    RK4 defect rows are the curvature-heavy equality family)."""
    from riskaversetrajopt_tpu.core.config import HopperScenario
    from riskaversetrajopt_tpu.models.hopper import HopperModel

    model = HopperModel(HopperScenario())
    field = model.sample_friction(jax.random.PRNGKey(1), model.M, "baseline")
    f, g, gL, gU, n_eq, xL, xU = model.make_nlp(field, "baseline", 0.1)
    Z0 = model.initial_guess(model.M)
    res = solve_nlp(f, g, gL, gU, n_eq, xL, xU, Z0,
                    NLPConfig(tol=1e-4, max_iter=60, soc=True))
    assert float(res.prim_res) < 1e-2
    assert bool(jnp.all(jnp.isfinite(res.Z)))


def test_f32_kkt_equilibration_keeps_residuals_honest():
    """In raw f32 the hopper's augmented KKT (cond ~1e8 > 1/eps_f32) yields
    garbage Newton directions and the barrier solve can certify a spurious
    point within ~20 iterations. With symmetric Ruiz equilibration
    (kkt_ruiz_iters) the f32 dual residual stays honest: the solve keeps
    working instead of falsely declaring convergence."""
    from riskaversetrajopt_tpu.core.config import HopperScenario
    from riskaversetrajopt_tpu.models.hopper import HopperModel

    model = HopperModel(HopperScenario())
    field = model.sample_friction(jax.random.PRNGKey(1), model.M, "baseline")
    f, g, gL, gU, n_eq, xL, xU = model.make_nlp(field, "baseline", 0.1)
    Z0 = model.initial_guess(model.M, dtype=jnp.float32)
    b32 = [a.astype(jnp.float32) for a in (gL, gU, xL, xU)]
    res = solve_nlp(f, g, b32[0], b32[1], n_eq, b32[2], b32[3], Z0,
                    NLPConfig(tol=1e-3, max_iter=60, kkt_ruiz_iters=3))
    assert bool(jnp.all(jnp.isfinite(res.Z)))
    # the equilibrated solve must not certify a spurious early stationary
    # point: at 60 iterations the true dual residual is far above tol
    assert not bool(res.solved)
    assert float(res.dual_res) > 1e-3


def test_compensated_merit_matches_plain_in_x64():
    """merit_compensated only changes the ARITHMETIC of the line-search
    accept test; in x64 (where the plain merit is already accurate) the
    solve trajectory must be unchanged."""

    def f(Z):
        return (Z[0] - 1.0) ** 2 + (Z[1] - 2.0) ** 2

    def g(Z):
        return jnp.array([Z[0] ** 2 + Z[1] ** 2])

    kw = dict(g_L=jnp.array([-1e15]), g_U=jnp.array([1.5]), n_eq=0,
              x_L=jnp.full(2, -1e15), x_U=jnp.full(2, 1e15), Z0=jnp.zeros(2))
    a = solve_nlp(f, g, cfg=NLPConfig(tol=1e-8, max_iter=100), **kw)
    b = solve_nlp(f, g, cfg=NLPConfig(tol=1e-8, max_iter=100,
                                      merit_compensated=True), **kw)
    assert bool(a.solved) and bool(b.solved)
    assert int(a.iters) == int(b.iters)
    np.testing.assert_allclose(np.asarray(a.Z), np.asarray(b.Z), rtol=1e-12)
