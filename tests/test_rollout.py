"""Rollout + linearization unit tests against straightforward NumPy oracles
re-deriving the reference recurrences (car/driving.py:186-204,
drone/drone_risk.py:139-155)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riskaversetrajopt_tpu.core.config import CarScenario, DroneScenario
from riskaversetrajopt_tpu.models.car import CarModel
from riskaversetrajopt_tpu.models.drone import DroneModel
from riskaversetrajopt_tpu.ops.rollout import (
    linearize,
    linearize_batch,
    rollout,
    rollout_batch,
)


def numpy_drone_rollout(scn, us, mass, dWs):
    """Literal transcription of the drone Euler-Maruyama recurrence."""
    dt = scn.dt
    K = np.zeros((scn.n_u, scn.n_x))
    K[:, :3] = 0.05 * np.eye(3)
    K[:, 3:] = 0.25 * np.eye(3)
    K = -K
    xs = np.zeros((scn.S + 1, scn.n_x))
    xs[0] = np.asarray(scn.x_init)
    for t in range(scn.S):
        x, u = xs[t], us[t]
        v = x[3:6]
        b = np.zeros(scn.n_x)
        b[:3] = v
        b[3:6] = (u + K @ x) / mass - scn.drag_coefficient * np.abs(v) * v / mass
        sig = np.zeros((scn.n_x, scn.n_x))
        sig[3:6, 3:6] = (scn.beta / mass) * np.eye(3)
        xs[t + 1] = x + dt * b + np.sqrt(dt) * sig @ dWs[t]
    return xs


def test_drone_rollout_matches_numpy_oracle():
    scn = DroneScenario()
    model = DroneModel(scn)
    key = jax.random.PRNGKey(0)
    omegas = model.sample(key, M=4, method="saa")
    us = jax.random.normal(jax.random.PRNGKey(1), (scn.S, scn.n_u), dtype=jnp.float64)

    Xs = rollout_batch(model, us, omegas)
    assert Xs.shape == (4, scn.S + 1, scn.n_x)
    for i in range(4):
        expected = numpy_drone_rollout(
            scn, np.asarray(us), float(omegas.mass[i]), np.asarray(omegas.dWs[i])
        )
        np.testing.assert_allclose(np.asarray(Xs[i]), expected, rtol=1e-12, atol=1e-12)


def test_drone_noise_scaling_quirk():
    """The dW samples carry sqrt(dt) and the rollout applies sqrt(dt) again:
    net noise contribution must be dt * sigma @ N(0,I) (see
    ops/rollout.py module docstring)."""
    scn = DroneScenario()
    model = DroneModel(scn)
    omega = model.sample(jax.random.PRNGKey(0), M=1, method="saa")
    omega_unit = omega._replace(
        dWs=jnp.ones_like(omega.dWs)
    )  # dW == 1 (pretend pre-scaled value is exactly 1)
    om = jax.tree.map(lambda a: a[0], omega_unit)
    us = jnp.zeros((scn.S, scn.n_u))
    xs = rollout(model, us, om)
    # after one step, velocity block = dt*b + sqrt(dt)*(beta/mass)*1
    x1_expected_vel_noise = np.sqrt(scn.dt) * scn.beta / float(om.mass)
    x0 = np.asarray(scn.x_init)
    b0_vel = (-np.asarray(model._fb_gain @ jnp.asarray(x0)) * 0)  # placeholder
    # compute drift at x0 directly
    b0 = np.asarray(model.drift(jnp.asarray(x0), us[0], om))
    expected_x1 = x0 + scn.dt * b0
    expected_x1[3:6] += x1_expected_vel_noise
    np.testing.assert_allclose(np.asarray(xs[1]), expected_x1, rtol=1e-12)


def test_car_rollout_baseline_pedestrian_constant_velocity():
    """With zeroed interaction gains and no noise (baseline), the pedestrian
    moves in a straight line at its initial velocity."""
    scn = CarScenario()
    model = CarModel(scn)
    omegas = model.sample(jax.random.PRNGKey(0), M=2, method="baseline")
    us = jnp.zeros((scn.S, scn.n_u))
    Xs = rollout_batch(model, us, omegas)
    ped_v = np.asarray(scn.velocity_ped_init)
    for t in range(scn.S + 1):
        np.testing.assert_allclose(
            np.asarray(Xs[0, t, 4:6]),
            np.asarray(scn.position_ped_init) + t * scn.dt * ped_v,
            rtol=1e-10,
            atol=1e-12,
        )
        np.testing.assert_allclose(np.asarray(Xs[0, t, 6:8]), ped_v, atol=1e-12)


@pytest.mark.parametrize("model_name", ["drone", "car"])
def test_linearize_matches_finite_differences(model_name):
    if model_name == "drone":
        model = DroneModel(DroneScenario())
    else:
        model = CarModel(CarScenario())
    omegas = model.sample(jax.random.PRNGKey(42), M=3, method="saa")
    om = jax.tree.map(lambda a: a[1], omegas)
    us = 0.1 * jax.random.normal(
        jax.random.PRNGKey(7), (model.S, model.n_u), dtype=jnp.float64
    )

    lin = linearize(model, us, om)
    assert lin.g_jac.shape == (model.K, model.S * model.n_u)
    assert lin.f_jac.shape == (model.n_fc, model.S * model.n_u)

    # central finite differences over a few random directions
    rng = np.random.default_rng(0)
    eps = 1e-6
    for _ in range(3):
        d = rng.standard_normal((model.S, model.n_u))
        d_vec = d.reshape(-1)  # us_vec layout: t-major, matches 'C' reshape
        up = us + eps * d
        dn = us - eps * d

        def vals(u):
            from riskaversetrajopt_tpu.ops.rollout import rollout as _ro

            xs = _ro(model, u, om)
            return (
                np.asarray(model.final_constraints(xs)),
                np.asarray(model.ineq_constraints(xs, om)),
            )

        f_up, g_up = vals(up)
        f_dn, g_dn = vals(dn)
        np.testing.assert_allclose(
            np.asarray(lin.f_jac) @ d_vec, (f_up - f_dn) / (2 * eps), rtol=2e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(lin.g_jac) @ d_vec, (g_up - g_dn) / (2 * eps), rtol=2e-5, atol=1e-7
        )


def test_linearize_batch_shapes_and_primal_consistency():
    model = DroneModel(DroneScenario())
    omegas = model.sample(jax.random.PRNGKey(3), M=5, method="saa")
    us = model.initial_guess().astype(jnp.float64)
    lin = linearize_batch(model, us, omegas)
    assert lin.g_val.shape == (5, model.K)
    assert lin.g_jac.shape == (5, model.K, model.S * model.n_u)
    Xs = rollout_batch(model, us, omegas)
    np.testing.assert_allclose(np.asarray(lin.xs), np.asarray(Xs), rtol=1e-12)
