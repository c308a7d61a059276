"""Gaussian-linearization uncertainty propagation and quantile back-off.

Shared machinery of the two Gaussian baselines (car/driving_gaussian.py:188-258
and drone/drone_gaussian.py:176-266, following the ECC-2020 method referenced
there): propagate the state covariance through the linearized dynamics

    Sigma_{t+1} = A_t Sigma_t A_t^T + dt * sigma sigma^T + Sigma_param,
    A_t = I + dt * db/dx(x_t, u_t),
    Sigma_param = sum_j var_j * (dt * db/domega_j)(dt * db/domega_j)^T

(the parameter term uses the iid-per-step approximation documented at
drone/drone_gaussian.py:188-199), and turn chance constraints into quantile
back-offs  distance - ndtri(1 - alpha_t) * sqrt(n^T Sigma n) - radius >= 0.

The reference runs the recursion as a fori_loop updating a preallocated array
(car/driving_gaussian.py:194-226); here it is a `lax.scan` carrying Sigma.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import ndtri


def normal_quantile(p):
    """norm.ppf(p) (car/driving_utils.py:6-7)."""
    return ndtri(p)


def propagate_covariance(
    xs, us, Sigma0, drift_jac_x, disp_cols, param_jacs, param_vars, dt
):
    """Scan the covariance recursion along a nominal trajectory.

    Args:
      xs: (S+1, n_x) nominal (mean) trajectory.
      us: (S, n_u) controls.
      Sigma0: (n_x, n_x) initial covariance.
      drift_jac_x: (x, u) -> (n_x, n_x) Jacobian of the drift at nominal
        parameters.
      disp_cols: (x, u) -> (n_x, n_x) diffusion matrix sigma(x, u).
      param_jacs: list of (x, u) -> (n_x,) drift Jacobians w.r.t. each scalar
        uncertain parameter at its nominal value.
      param_vars: list of matching scalar variances.
      dt: step.

    Returns:
      Sigmas: (S+1, n_x, n_x).
    """
    n_x = xs.shape[1]
    eye = jnp.eye(n_x, dtype=xs.dtype)

    def step(Sigma, xu):
        x, u = xu
        A = eye + dt * drift_jac_x(x, u)
        sig = disp_cols(x, u)
        Sigma_w = dt * sig @ sig.T
        Sigma_next = A @ Sigma @ A.T + Sigma_w
        for jac, var in zip(param_jacs, param_vars):
            b_d = dt * jac(x, u)
            # REFERENCE QUIRK REPRODUCED DELIBERATELY (do not "fix"): the
            # reference writes `var * b_dm @ b_dm.T`
            # (drone_gaussian.py:206-211, driving_gaussian.py:206-211) with
            # b_dm the 1-D jacfwd of the drift w.r.t. the SCALAR parameter —
            # for 1-D arrays `.T` is a no-op and `@` is a DOT PRODUCT, so
            # the intended rank-1 outer product var*b b^T degenerates to the
            # scalar var*||b||^2 broadcast-ADDED TO EVERY ENTRY of Sigma.
            # Verified by executed-reference row parity
            # (tests/test_reference_parity.py::test_drone_gaussian_stack_*).
            Sigma_next = Sigma_next + var * jnp.dot(b_d, b_d)
        return Sigma_next, Sigma_next

    _, Sigmas_tail = lax.scan(step, Sigma0, (xs[:-1], us))
    return jnp.concatenate([Sigma0[None], Sigmas_tail], axis=0)
