"""Stochastic rollout and fused linearization.

The reference rolls out Euler-Maruyama with a Python-unrolled loop per sample
(car/driving.py:186-204, drone/drone_risk.py:139-155) and differentiates the
whole rollout with jacfwd at every SCP iteration (car/driving.py:260-298).
Here the rollout is a `lax.scan` (compiles once regardless of horizon) and
linearization is forward-mode through the scan, vmapped over samples — one
fused XLA computation produces trajectories, constraint values and constraint
Jacobians (hot kernel #1, SURVEY.md section 7.1.3).

NUMERICAL QUIRK REPRODUCED DELIBERATELY (do not "fix"): the Brownian
increments are sampled already scaled by sqrt(dt)
(car/driving.py:116, drone/drone_utils.py:87-90) and the rollout multiplies by
sqrt(dt) AGAIN (car/driving.py:200, drone/drone_risk.py:151), so the noise
enters at order dt^1. We reproduce the net behavior exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


def rollout(model, us_mat, omega):
    """Euler-Maruyama rollout for one sample.

    x_{t+1} = x_t + dt * b(x_t, u_t, omega) + sqrt(dt) * sigma(x_t, u_t) @ dW_t
    with dW pre-scaled by sqrt(dt) at sampling time (see module docstring).

    Args:
      model: SAAModel.
      us_mat: (S, n_u) controls.
      omega: per-sample uncertainty pytree (contains .dWs of shape (S, n_x)).

    Returns:
      xs: (S+1, n_x) state trajectory.
    """
    dt = model.dt
    sqrt_dt = jnp.sqrt(jnp.asarray(dt, dtype=us_mat.dtype))
    x_init = model.x0(omega).astype(us_mat.dtype)

    def step(x, inp):
        u, dW = inp
        xn = (
            x
            + dt * model.drift(x, u, omega)
            + sqrt_dt * model.dispersion(x, u, omega, dW)
        )
        return xn, xn

    _, xs_tail = lax.scan(step, x_init, (us_mat, omega.dWs))
    return jnp.concatenate([x_init[None, :], xs_tail], axis=0)


def rollout_batch(model, us_mat, omegas):
    """Rollout vmapped over the sample axis of `omegas`.

    Matches us_to_state_trajectories (car/driving.py:206-214): the same
    control sequence for every sample. Returns (M, S+1, n_x)."""
    return jax.vmap(lambda om: rollout(model, us_mat, om))(omegas)


class SampleLinearization(NamedTuple):
    """Constraint values and Jacobians for one sample (leading axis M when
    produced by `linearize_batch`), in the us_vec layout
    us_vec[t * n_u + i] = us_mat[t, i] (reference layout contract,
    car/driving.py:122-130)."""

    f_val: jnp.ndarray  # (n_fc,) final-constraint values
    f_jac: jnp.ndarray  # (n_fc, S * n_u)
    g_val: jnp.ndarray  # (K,) inequality-constraint values
    g_jac: jnp.ndarray  # (K, S * n_u)
    xs: jnp.ndarray  # (S+1, n_x) primal trajectory


def linearize(model, us_mat, omega) -> SampleLinearization:
    """Values + Jacobians of (final, ineq) constraints w.r.t. the controls for
    one sample, via forward-mode through the scanned rollout.

    Equivalent of get_all_constraints_coeffs (car/driving.py:260-298,
    drone/drone_risk.py:239-280) with the value and Jacobian produced in one
    pass (jax.linearize evaluates the primal once and reuses it for all S*n_u
    tangents, unlike the reference's separate value + jacfwd calls)."""
    S, n_u = model.S, model.n_u

    def constraints_of_us(us):
        xs = rollout(model, us, omega)
        return model.final_constraints(xs), model.ineq_constraints(xs, omega), xs

    (f_val, g_val, xs), jvp = jax.linearize(constraints_of_us, us_mat)

    # Push the S*n_u basis tangents through in one batched jvp: the tangent
    # basis in us_vec layout is reshape(eye(S*n_u), (S*n_u, S, n_u)) C-order,
    # which matches the reference's jacfwd-then-reshape('C') convention
    # (car/driving.py:284-286).
    basis = jnp.eye(S * n_u, dtype=us_mat.dtype).reshape(S * n_u, S, n_u)
    f_jac_t, g_jac_t, _ = jax.vmap(jvp)(basis)  # (S*n_u, n_fc), (S*n_u, K)
    return SampleLinearization(
        f_val=f_val,
        f_jac=f_jac_t.T,
        g_val=g_val,
        g_jac=g_jac_t.T,
        xs=xs,
    )


def linearize_batch(model, us_mat, omegas) -> SampleLinearization:
    """`linearize` vmapped over the sample axis — the define-phase hot kernel.

    Returns a SampleLinearization whose fields carry a leading M axis."""
    return jax.vmap(lambda om: linearize(model, us_mat, om))(omegas)
