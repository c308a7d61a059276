"""VaR/AVaR estimator tests against direct definitions and the reference's
sort-order semantics (drone_main_plot.py:640-652)."""

import jax.numpy as jnp
import numpy as np
import pytest

from riskaversetrajopt_tpu.ops.cvar import avar, avar_qp, var_sorted


def test_var_sorted_matches_reference_order_statistic():
    rng = np.random.default_rng(0)
    M, alpha = 1000, 0.1
    Z = rng.standard_normal(M)
    # reference: xth = floor(alpha*M); Z_sorted[M - xth - 1]
    Zs = np.sort(Z)
    expected = Zs[M - int(np.floor(alpha * M)) - 1]
    assert float(var_sorted(jnp.asarray(Z), alpha)) == pytest.approx(expected)


def test_var_definition_property():
    """VaR_alpha is the smallest t with P(Z > t) <= alpha (empirically)."""
    rng = np.random.default_rng(1)
    M, alpha = 500, 0.2
    Z = rng.standard_normal(M)
    t = float(var_sorted(jnp.asarray(Z), alpha))
    assert np.mean(Z > t) <= alpha
    # any smaller sample value fails the property
    smaller = np.max(Z[Z < t])
    assert np.mean(Z > smaller) > alpha


def test_avar_tail_mean_property():
    """For alpha*M integral, AVaR equals the mean of the alpha-tail."""
    rng = np.random.default_rng(2)
    M, alpha = 1000, 0.1
    Z = rng.standard_normal(M)
    got = float(avar(jnp.asarray(Z), alpha))
    tail = np.sort(Z)[::-1][: int(alpha * M)]
    assert got == pytest.approx(tail.mean(), rel=1e-3)


def test_avar_qp_matches_closed_form():
    rng = np.random.default_rng(3)
    M, alpha = 150, 0.15
    Z = rng.standard_normal(M) * 2.0 + 0.5
    np.testing.assert_allclose(
        float(avar_qp(Z, alpha)), float(avar(jnp.asarray(Z), alpha)), atol=1e-4
    )


def test_avar_qp_reference_mc_size():
    """The QP path must work at the reference's MC estimation size M=10000
    (car/driving.py:621,639-671) — the structured arrow operator never
    builds the dense (2M, M+1) matrix."""
    rng = np.random.default_rng(7)
    M, alpha = 10000, 0.05
    Z = rng.standard_normal(M) * 0.3 - 0.1
    np.testing.assert_allclose(
        float(avar_qp(Z, alpha)), float(avar(jnp.asarray(Z), alpha)), atol=1e-4
    )


def test_avar_monotone_in_alpha():
    rng = np.random.default_rng(4)
    Z = jnp.asarray(rng.standard_normal(400))
    vals = [float(avar(Z, a)) for a in [0.05, 0.1, 0.2, 0.4]]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
