"""End-to-end SCP tests on the car workload (car/driving.py semantics:
15 SCP iterations, gate_iters=1 with zeroed rows, no MULTIPLIER row scale,
slack penalty 1000)."""

import jax
import jax.numpy as jnp
import numpy as np

from riskaversetrajopt_tpu.core.config import CarScenario
from riskaversetrajopt_tpu.models.car import CarModel
from riskaversetrajopt_tpu.scp.driver import SAATrajOpt


def test_car_saa_scp_end_to_end():
    model = CarModel(CarScenario())
    opt = SAATrajOpt(model, method="saa")
    assert opt.scp_cfg.num_iters == 15
    assert opt.scp_cfg.gate_iters == 1
    assert opt.static.slack_penalty == 1000.0
    assert opt.static.row_scale == 1.0

    M = 8
    omegas = opt.sample(jax.random.PRNGKey(0), M=M)
    res = opt.solve(omegas, alpha=0.1)

    l2 = np.asarray(res.l2_errors)
    assert l2[-1] < 2e-2, f"L2 errors: {l2}"

    # ego terminal constraint in sample average (driving.py:216-221)
    goal = np.concatenate(
        [np.asarray(model.scn.position_ego_goal), np.asarray(model.scn.velocity_ego_goal)]
    )
    mean_final = np.asarray(jnp.mean(res.xs[:, -1, :4], axis=0))
    np.testing.assert_allclose(mean_final, goal, atol=2e-2)

    # separation-distance CVaR holds at alpha on the training samples
    g_all = jax.vmap(lambda om, xs: model.ineq_constraints(xs, om))(omegas, res.xs)
    worst = np.asarray(jnp.max(g_all, axis=1))
    from riskaversetrajopt_tpu.ops.cvar import avar

    assert float(avar(jnp.asarray(worst), 0.1)) <= 5e-2

    assert float(jnp.max(jnp.abs(res.us))) <= model.scn.u_max + 1e-6


def test_car_baseline_and_mc():
    model = CarModel(CarScenario())
    opt = SAATrajOpt(model, method="baseline")
    omegas = opt.sample(jax.random.PRNGKey(0), M=4, method="baseline")
    res = opt.solve(omegas, alpha=0.1)
    assert np.asarray(res.l2_errors)[-1] < 2e-2

    # MC validation against fresh SAA samples (driving.py:618-740)
    opt_saa = SAATrajOpt(model, method="saa")
    mc_omegas = opt_saa.sample(jax.random.PRNGKey(9), M=300)
    mc = opt_saa.monte_carlo(res.us, mc_omegas, alpha=0.1)
    assert np.isfinite(float(mc["avar"]))
    assert 0.0 <= float(mc["safe_frac"]) <= 1.0
    assert float(mc["cost"]) > 0.0
