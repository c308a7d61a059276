"""End-to-end SCP tests on the drone workload: convergence of the control
iterates, terminal-constraint satisfaction, obstacle avoidance on the training
samples, and Monte-Carlo out-of-sample validation (the reference's de-facto
integration test, SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from riskaversetrajopt_tpu.core.config import DroneScenario, SCPConfig
from riskaversetrajopt_tpu.models.drone import DroneModel
from riskaversetrajopt_tpu.scp.driver import SAATrajOpt


def test_drone_saa_scp_end_to_end():
    model = DroneModel(DroneScenario())
    opt = SAATrajOpt(
        model,
        method="saa",
        scp_cfg=SCPConfig(
            num_iters=25, gate_iters=2, gate_row_scale=1e-7,
            gate_bound_l=-0.1, gate_bound_u=0.1,
        ),
    )
    M = 8
    omegas = opt.sample(jax.random.PRNGKey(0), M=M)
    res = opt.solve(omegas, alpha=0.2)

    l2 = np.asarray(res.l2_errors)
    # SCP iterates converge (reference plots these on a log scale,
    # car/driving.py:758-785)
    assert l2[-1] < 5e-3, f"L2 errors: {l2}"
    # all post-gating QP solves succeeded
    assert bool(jnp.all(res.qp_solved[3:])), np.asarray(res.qp_iters)

    # terminal constraint in sample average: mean final state ~ x_final
    mean_final = np.asarray(jnp.mean(res.xs[:, -1, :], axis=0))
    np.testing.assert_allclose(
        mean_final, np.asarray(model.scn.x_final), atol=5e-3
    )

    # obstacle constraints hold on (most of) the training samples: with
    # alpha=0.2 and the CVaR reformulation, the average of the worst
    # (1-alpha) tail must be <= 0; check the empirical AVaR directly
    g_all = jax.vmap(lambda om, xs: model.ineq_constraints(xs, om))(
        omegas, res.xs
    )  # (M, K)
    worst_per_sample = np.asarray(jnp.max(g_all, axis=1))
    from riskaversetrajopt_tpu.ops.cvar import avar

    avar_val = float(avar(jnp.asarray(worst_per_sample), 0.2))
    assert avar_val <= 1e-2, f"AVaR of max constraint: {avar_val}"

    # controls respect bounds
    assert float(jnp.max(jnp.abs(res.us))) <= model.scn.u_max + 1e-6


def test_drone_monte_carlo_validation():
    model = DroneModel(DroneScenario())
    opt = SAATrajOpt(
        model,
        method="saa",
        scp_cfg=SCPConfig(
            num_iters=25, gate_iters=2, gate_row_scale=1e-7,
            gate_bound_l=-0.1, gate_bound_u=0.1,
        ),
    )
    omegas = opt.sample(jax.random.PRNGKey(1), M=16)
    alpha = 0.2
    res = opt.solve(omegas, alpha=alpha)

    mc_omegas = opt.sample(jax.random.PRNGKey(123), M=500)
    mc = opt.monte_carlo(res.us, mc_omegas, alpha)
    # out-of-sample safety should be near 1 - alpha (SAA guarantee is
    # asymptotic in M; small M gives slack, so use a loose bound)
    assert float(mc["safe_frac"]) > 0.5
    assert np.isfinite(float(mc["avar"]))
    assert float(mc["cost"]) > 0.0


def test_drone_baseline_scp():
    model = DroneModel(DroneScenario())
    opt = SAATrajOpt(
        model,
        method="baseline",
        scp_cfg=SCPConfig(
            num_iters=25, gate_iters=2, gate_row_scale=1e-7,
            gate_bound_l=-0.1, gate_bound_u=0.1,
        ),
        baseline_pad=1e-3,
    )
    M = 4
    omegas = opt.sample(jax.random.PRNGKey(0), M=M, method="baseline")
    res = opt.solve(omegas, alpha=0.1)
    l2 = np.asarray(res.l2_errors)
    assert l2[-1] < 5e-3, f"L2 errors: {l2}"
    # baseline avoids obstacles deterministically (with the 1e-3 padding)
    g_all = jax.vmap(lambda om, xs: model.ineq_constraints(xs, om))(
        omegas, res.xs
    )
    assert float(jnp.max(g_all)) <= 1e-2
