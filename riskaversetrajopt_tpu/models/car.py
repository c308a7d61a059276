"""Planar ego-car + interactive pedestrian model (social-force interaction),
with uncertain interaction gains, uncertain pedestrian initial state, and
Brownian noise on the pedestrian velocity.

Behavior parity with car/driving.py:83-236, re-designed as pure functions
over an explicit uncertainty pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from riskaversetrajopt_tpu.core.config import CarScenario
from riskaversetrajopt_tpu.models.base import ConstBind


class CarOmega(NamedTuple):
    """Per-sample uncertain parameters (leading axis M when batched)."""

    state_init: jnp.ndarray  # (n_x,) or (M, n_x)
    omega_speed: jnp.ndarray  # () or (M,)
    omega_repulsive: jnp.ndarray  # () or (M,)
    dWs: jnp.ndarray  # (S, n_x) or (M, S, n_x) -- already scaled by sqrt(dt)


class CarModel(ConstBind):
    """SAA car model. Reference: car/driving.py Model (lines 83-236)."""

    # see models/base.ConstBind: these must cross jit boundaries as args
    const_attrs = ("_state_init", "_goal")

    def __init__(self, scn: CarScenario = CarScenario()):
        self.scn = scn
        self.n_x = scn.n_x
        self.n_u = scn.n_u
        self.S = scn.S
        self.dt = scn.dt
        self.K = scn.S  # one separation-distance constraint per step
        self.n_fc = 4  # ego final state rows (driving.py:216-221)
        self.row_scale = 1.0  # car packing applies no multiplier
        # slack objective weight (driving.py:386-389)
        self.slack_penalty = 1000.0
        self._state_init = scn.state_init
        self._goal = jnp.concatenate((scn.position_ego_goal, scn.velocity_ego_goal))

    # -- dynamics ----------------------------------------------------------
    def _force_on_pedestrian(self, x, omega_speed, omega_repulsive):
        """Social-force interaction (driving.py:145-158): repulsion from the
        ego car plus desired-speed restoring force."""
        position_ego = x[0:2]
        position_ped = x[4:6]
        speed_ego_along_y = x[7]
        positions_delta = position_ego - position_ped
        force = -omega_repulsive * positions_delta / jnp.linalg.norm(positions_delta)
        force = force + omega_speed * (self.scn.speed_ped_des - speed_ego_along_y)
        return force

    def drift(self, x, u, omega: CarOmega):
        """b(x, u, omega): Dubins-like ego (px, py, v, phi) + double-integrator
        pedestrian driven by the interaction force (driving.py:160-178)."""
        vel_lin_ego, phi_ego = x[2], x[3]
        force = self._force_on_pedestrian(x, omega.omega_speed, omega.omega_repulsive)
        return jnp.stack(
            [
                vel_lin_ego * jnp.cos(phi_ego),
                vel_lin_ego * jnp.sin(phi_ego),
                u[0],
                u[1],
                x[6],
                x[7],
                force[0],
                force[1],
            ]
        )

    def dispersion(self, x, u, omega: CarOmega, dW):
        """sigma @ dW with sigma = beta * I on the pedestrian-velocity block
        (driving.py:180-184), in matvec form."""
        out = jnp.zeros(self.n_x, dtype=x.dtype)
        return out.at[6:8].set(self.scn.beta * dW[6:8])

    def x0(self, omega: CarOmega):
        return omega.state_init

    # -- constraints -------------------------------------------------------
    def ineq_constraints(self, xs, omega: CarOmega):
        """g_t = -(separation_distance(x_t) - d_min) <= 0 for t = 1..S
        (driving.py:223-236, negated at driving.py:270)."""
        delta = xs[1:, 0:2] - xs[1:, 4:6]
        dist = jnp.linalg.norm(delta, axis=-1)
        return -(dist - self.scn.min_separation_distance)

    def final_constraints(self, xs):
        """Ego final state rows xs[-1, :4] - goal (driving.py:216-221)."""
        return xs[-1, :4] - self._goal

    # -- objective ---------------------------------------------------------
    def control_cost(self, us_mat):
        """dt * sum_t u_t^T R u_t (driving.py:623-629)."""
        R = self.scn.R
        return self.dt * jnp.sum(jnp.einsum("ti,ij,tj->t", us_mat, R, us_mat))

    # -- sampling ----------------------------------------------------------
    def sample(self, key, M: int, method: str = "saa") -> CarOmega:
        """Reference distributions (driving.py:94-120): uniform interaction
        gains, Gaussian pedestrian initial-state perturbation with std
        sqrt(variance_ped_initial_state), Brownian increments sqrt(dt)*N(0,I).

        'baseline' zeroes the gains and the noise but keeps the nominal
        initial state (driving.py:117-120)."""
        scn = self.scn
        k_speed, k_rep, k_init, k_dw = jax.random.split(key, 4)
        if method == "saa":
            omegas_speed = jax.random.uniform(
                k_speed, (M,),
                minval=scn.omega_speed_nom - scn.omega_speed_del,
                maxval=scn.omega_speed_nom + scn.omega_speed_del,
            )
            omegas_repulsive = jax.random.uniform(
                k_rep, (M,),
                minval=scn.omega_repulsive_nom - scn.omega_repulsive_del,
                maxval=scn.omega_repulsive_nom + scn.omega_repulsive_del,
            )
            std = jnp.sqrt(scn.variance_ped_initial_state)
            ped_perturb = jax.random.normal(k_init, (M, 4)) @ std.T
            states_init = jnp.broadcast_to(scn.state_init, (M, scn.n_x))
            states_init = states_init.at[:, 4:].add(ped_perturb)
            dWs = jnp.sqrt(scn.dt) * jax.random.normal(k_dw, (M, scn.S, scn.n_x))
        elif method == "baseline":
            omegas_speed = jnp.zeros(M)
            omegas_repulsive = jnp.zeros(M)
            states_init = jnp.broadcast_to(scn.state_init, (M, scn.n_x))
            dWs = jnp.zeros((M, scn.S, scn.n_x))
        else:
            raise ValueError(f"unknown sampling method: {method}")
        return CarOmega(
            state_init=states_init,
            omega_speed=omegas_speed,
            omega_repulsive=omegas_repulsive,
            dWs=dWs,
        )

    def default_scp_config(self):
        """Reference SCP knobs: 15 iterations (driving.py:60), first
        iteration gated by zeroing rows — bounds become (-inf, 0) via the
        reference's NaN-through-OSQP quirk (driving.py:411-415, see
        ops/saa_qp.py docstring)."""
        from riskaversetrajopt_tpu.core.config import SCPConfig

        return SCPConfig(
            num_iters=15,
            gate_iters=1,
            gate_row_scale=0.0,
            gate_bound_l=-jnp.inf,
            gate_bound_u=0.0,
        )

    # -- initial guess -----------------------------------------------------
    def initial_guess(self):
        """Midpoint-of-bounds + 1e-2 on every control (driving.py:132-143)."""
        return jnp.full((self.S, self.n_u), 1e-2)
