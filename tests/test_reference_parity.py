"""Golden parity against the ACTUAL reference code (/root/reference).

These tests execute the reference scripts' define-phase math (via
tools.reference_oracle: stubbed osqp, patched flags) and assert

1. row-level QP-data equality: the reference's packed (P, q, A, l, u)
   (drone_risk.py:282-374 + 393-421, driving.py:301-373 + 399-421) matches
   this framework's structured operator at <= 1e-9, at both a gated and an
   ungated SCP iteration;
2. golden-trajectory parity: driving the reference SCP loop
   (drone_risk.py:495-540, driving.py:467-530 — warm-up, reset, gating)
   with an INDEPENDENT scipy OSQP-style ADMM as the QP engine produces a
   control sequence the framework's own solver path matches within the
   north-star relative-L2 tolerance of 1e-3 (BASELINE.md).

The M=1000 drone case runs the same assertion at the north-star problem
size (marked slow; ~minutes on CPU x64).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riskaversetrajopt_tpu.core.config import (
    CarScenario,
    DroneScenario,
    SCPConfig,
    SolverConfig,
)
from riskaversetrajopt_tpu.models.car import CarModel
from riskaversetrajopt_tpu.models.drone import DroneModel
from riskaversetrajopt_tpu.ops.rollout import linearize_batch
from riskaversetrajopt_tpu.ops.saa_qp import (
    SAAQPOps,
    SAAQPStatic,
    build_bounds,
    build_objective,
    pack_saa_qp_data,
)
from riskaversetrajopt_tpu.scp.driver import SAATrajOpt
from tools import reference_oracle as ro


@pytest.fixture(autouse=True)
def _tight_oracle():
    """Golden runs tighten the oracle engine so trajectories are the SCP map
    with accurate QP solves (per-QP noise at the reference's OSQP_TOL is an
    artifact of a specific solver's iterate path, not of the math)."""
    ro.StubOSQP.eps_override = 1e-6
    ro.StubOSQP.max_iter_override = 400000
    yield
    ro.StubOSQP.eps_override = None
    ro.StubOSQP.max_iter_override = None


def _dense_A(ops, nv):
    return np.asarray(
        jax.vmap(ops.matvec_A, in_axes=1, out_axes=1)(jnp.eye(nv))
    )


def _assert_rows_match(A_ref, l_ref, u_ref, A_mine, l_mine, u_mine, tol=1e-9):
    """Row-for-row equality with OSQP's NaN->-inf bound semantics applied to
    the reference side (the car's iter-0 gating produces NaN lower bounds,
    driving.py:411-415; OSQP clamps them, see tools/reference_oracle.py)."""
    l_ref = np.where(np.isnan(l_ref), -np.inf, l_ref)
    u_ref = np.where(np.isnan(u_ref), np.inf, u_ref)
    np.testing.assert_allclose(A_mine, A_ref, atol=tol, rtol=0)
    assert np.array_equal(np.isfinite(l_ref), np.isfinite(l_mine))
    assert np.array_equal(np.isfinite(u_ref), np.isfinite(u_mine))
    fl, fu = np.isfinite(l_ref), np.isfinite(u_ref)
    np.testing.assert_allclose(l_mine[fl], l_ref[fl], atol=tol, rtol=0)
    np.testing.assert_allclose(u_mine[fu], u_ref[fu], atol=tol, rtol=0)


def _drone_static(model, M):
    scn = model.scn
    return SAAQPStatic(
        n=model.S * model.n_u, M=M, K=model.K, n_fc=model.n_fc,
        n_x=model.n_x, row_scale=model.row_scale,
        slack_penalty=model.slack_penalty, u_max=scn.u_max,
        baseline=False, baseline_pad=1e-3,
        gate_iters=2, gate_scale=1e-7, gate_l=-0.1, gate_u=0.1,
    )


def _car_static(model, M):
    scn = model.scn
    return SAAQPStatic(
        n=model.S * model.n_u, M=M, K=model.K, n_fc=model.n_fc,
        n_x=model.n_x, row_scale=model.row_scale,
        slack_penalty=model.slack_penalty, u_max=scn.u_max,
        baseline=False, baseline_pad=0.0,
        gate_iters=1, gate_scale=0.0, gate_l=-np.inf, gate_u=0.0,
    )


def _pack(model, om, us, alpha, st):
    us = jnp.asarray(us)
    lin = linearize_batch(model, us, om)
    scn = model.scn
    p_diag_u = jnp.tile(2.0 * scn.dt * jnp.diag(scn.R), model.S)
    return pack_saa_qp_data(lin, us.reshape(-1), p_diag_u, alpha)


@pytest.mark.parametrize("scp_iter", [0, 2])
def test_drone_qp_rows_match_reference(scp_iter):
    ns = ro.load_reference_script("drone/drone_risk.py")
    M, alpha = 6, 0.2
    ro.set_reference_M(ns, M)
    model = DroneModel(DroneScenario(M=M))
    om = model.sample(jax.random.PRNGKey(0), M=M)
    ref = ro.reference_drone_model(ns, om, alpha)
    us0 = ref.initial_guess_us_mat()

    A_ref, l_ref, u_ref = ref.get_constraints_coeffs(us0, scp_iter)
    P_ref, q_ref = ref.get_objective_coeffs()

    st = _drone_static(model, M)
    data = _pack(model, om, np.asarray(us0), alpha, st)
    ops = SAAQPOps(st, data, jnp.asarray(scp_iter))
    nv = st.n + st.M + 2
    A_mine = _dense_A(ops, nv)
    l_mine, u_mine = (np.asarray(v) for v in build_bounds(st, data, jnp.asarray(scp_iter)))
    _assert_rows_match(
        np.asarray(A_ref.todense()), np.asarray(l_ref), np.asarray(u_ref),
        A_mine, l_mine, u_mine,
    )
    p_diag, q = build_objective(st, data)
    np.testing.assert_allclose(
        np.diag(np.asarray(p_diag)), P_ref.todense(), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-12)


@pytest.mark.parametrize("scp_iter", [0, 2])
def test_car_qp_rows_match_reference(scp_iter):
    ns = ro.load_reference_script("car/driving.py")
    M, alpha = 5, 0.1
    ro.set_reference_M(ns, M)
    model = CarModel(CarScenario(M=M))
    om = model.sample(jax.random.PRNGKey(1), M=M)
    ref = ro.reference_car_model(ns, om, alpha)
    us0 = ref.initial_guess_us_mat()

    A_ref, l_ref, u_ref = ref.get_constraints_coeffs(us0, scp_iter)
    P_ref, q_ref = ref.get_objective_coeffs()

    st = _car_static(model, M)
    data = _pack(model, om, np.asarray(us0), alpha, st)
    ops = SAAQPOps(st, data, jnp.asarray(scp_iter))
    nv = st.n + st.M + 2
    A_mine = _dense_A(ops, nv)
    l_mine, u_mine = (np.asarray(v) for v in build_bounds(st, data, jnp.asarray(scp_iter)))
    _assert_rows_match(
        np.asarray(A_ref.todense()), np.asarray(l_ref), np.asarray(u_ref),
        A_mine, l_mine, u_mine,
    )
    p_diag, q = build_objective(st, data)
    np.testing.assert_allclose(
        np.diag(np.asarray(p_diag)), P_ref.todense(), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-12)


def _golden_vs_framework_drone(M, num_iters, alpha=0.2, seed=0):
    ns = ro.load_reference_script("drone/drone_risk.py")
    ro.set_reference_M(ns, M)
    model = DroneModel(DroneScenario(M=M))
    om = model.sample(jax.random.PRNGKey(seed), M=M)
    ref = ro.reference_drone_model(ns, om, alpha)
    gold, _ = ro.run_reference_scp_drone(ns, ref, num_iters)

    scp_cfg = SCPConfig(
        num_iters=num_iters, gate_iters=2, gate_row_scale=1e-7,
        gate_bound_l=-0.1, gate_bound_u=0.1,
    )
    opt = SAATrajOpt(model, method="saa", scp_cfg=scp_cfg)
    res = opt.solve(om, alpha=alpha)
    return np.asarray(res.us), gold


def test_drone_golden_trajectory_parity_m50():
    """North-star assertion at the reference config size (M=50,
    drone_params.py:7): the framework's solver path reproduces the
    reference-semantics golden control sequence within 1e-3 relative L2."""
    us, gold = _golden_vs_framework_drone(M=50, num_iters=15)
    err = ro.l2_error_us(us, gold)
    assert err <= 1e-3, f"relative L2 vs reference golden = {err:.3e}"


def test_car_golden_trajectory_parity_m50():
    ns = ro.load_reference_script("car/driving.py")
    M, alpha, num_iters = 50, 0.1, 15
    ro.set_reference_M(ns, M)
    model = CarModel(CarScenario(M=M))
    om = model.sample(jax.random.PRNGKey(2), M=M)
    ref = ro.reference_car_model(ns, om, alpha)
    gold, _ = ro.run_reference_scp_car(ns, ref, num_iters)

    opt = SAATrajOpt(model, method="saa", scp_cfg=model.default_scp_config())
    res = opt.solve(om, alpha=alpha)
    err = ro.l2_error_us(np.asarray(res.us), gold)
    assert err <= 1e-3, f"relative L2 vs reference golden = {err:.3e}"


@pytest.mark.slow
def test_drone_golden_trajectory_parity_m1000():
    """The BASELINE.md north star at M=1000: the framework solve against
    the COMMITTED reference-semantics golden (regenerating the golden runs
    the reference loop through the oracle for ~30 min — the transition QPs
    need ~20k ADMM iterations each; see tools/make_goldens.py for
    provenance and regeneration)."""
    import pathlib

    gold = np.load(
        pathlib.Path(__file__).parent / "fixtures" /
        "gold_drone_m1000_a0.2_seed0_iters15.npy"
    )
    M, alpha, num_iters = 1000, 0.2, 15
    model = DroneModel(DroneScenario(M=M))
    om = model.sample(jax.random.PRNGKey(0), M=M)
    scp_cfg = SCPConfig(
        num_iters=num_iters, gate_iters=2, gate_row_scale=1e-7,
        gate_bound_l=-0.1, gate_bound_u=0.1,
    )
    opt = SAATrajOpt(model, method="saa", scp_cfg=scp_cfg)
    res = opt.solve(om, alpha=alpha)
    err = ro.l2_error_us(np.asarray(res.us), gold)
    assert err <= 1e-3, f"relative L2 vs reference golden = {err:.3e}"


def test_hopper_stack_matches_reference():
    """Row-level hopper parity against the EXECUTED reference: exec
    hopper/hopper.py (compute blocks patched off, ipyopt stubbed), inject
    its np.random-seeded friction field into our model, and assert the full
    constraint stack g(Z) (reference order hopper.py:486-514), the
    objective, and the inequality bound tuples match at a perturbed point."""
    ns = ro.load_reference_script("hopper/hopper.py")
    from riskaversetrajopt_tpu.core.config import HopperScenario
    from riskaversetrajopt_tpu.models.hopper import FrictionField, HopperModel

    ours = HopperModel(HopperScenario())
    M = int(ns.M)
    assert M == ours.M
    np.testing.assert_allclose(
        np.asarray(ours.scn.state_initial), np.asarray(ns.state_initial)
    )
    np.testing.assert_allclose(
        np.asarray(ours.scn.state_final), np.asarray(ns.state_final)
    )
    alpha = 0.3
    ref = ns.Model(M, "saa", alpha)
    field = FrictionField(
        jnp.asarray(ns.intensities), jnp.asarray(ns.thetas),
        jnp.asarray(ns.taus),
    )
    rng = np.random.default_rng(0)
    Z = jnp.asarray(
        np.asarray(ours.initial_guess(M))
        + 0.01 * rng.standard_normal(ours.num_vars)
    )

    # NOTE: the reference's slip_risk head row uses module-global alpha-free
    # M*alpha via the instance attribute (hopper.py:350-367)
    g_ref = jnp.concatenate([
        ref.dynamics_constraints(Z),
        ref.initial_constraints(Z),
        ref.final_constraints(Z),
        ref.no_slip_constraints(Z),
        ref.contact_constraints(Z),
        ref.leg_over_ground_constraints(Z),
        ref.slip_risk_constraints(Z),
        ref.control_constraints(Z)[0],
        ref.slack_constraints(Z)[0],
        ref.length_and_speed_constraints(Z)[0],
    ])
    g_ours = ours.g_all(Z, field, "saa", alpha)
    assert g_ours.shape == g_ref.shape
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_ref), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(float(ours.f(Z)), float(ref.f(Z)), rtol=1e-12)

    # inequality bound tuples for the bounded families
    gL, gU, n_eq, xL, xU = ours.bounds("saa", M)
    n_over = len(ours.flight_idx)
    n_risk = 1 + M + M * ours.num_contacts + 1
    o = n_eq + n_over + n_risk
    n_ctrl = ours.S * ours.n_u
    _, cl, cu = ref.control_constraints(Z)
    np.testing.assert_allclose(np.asarray(gL[o:o + n_ctrl]), np.asarray(cl))
    np.testing.assert_allclose(np.asarray(gU[o:o + n_ctrl]), np.asarray(cu))
    o += n_ctrl
    _, sl, su = ref.slack_constraints(Z)
    np.testing.assert_allclose(np.asarray(gL[o:o + 1]), np.asarray(sl))
    np.testing.assert_allclose(np.asarray(gU[o:o + 1]), np.asarray(su))
    o += 1
    _, ll, lu = ref.length_and_speed_constraints(Z)
    np.testing.assert_allclose(np.asarray(gL[o:]), np.asarray(ll))
    np.testing.assert_allclose(np.asarray(gU[o:]), np.asarray(lu))


def test_drone_gaussian_stack_matches_reference():
    """Executed-reference parity for the drone Gaussian NLP define phase:
    g(Z) in reference row order [final | obs | state-box hi/lo | control+
    risk rows] (drone_gaussian.py:412-419, 352-382) and the objective must
    match our planner at a perturbed point — this exercises the mean
    rollout, the iid-mass covariance recursion, the quantile-padded
    obstacle rows with radius back-off, and the risk-allocation rows."""
    ns = ro.load_reference_script("drone/drone_gaussian.py")
    from riskaversetrajopt_tpu.core.config import DroneScenario
    from riskaversetrajopt_tpu.models.drone_gaussian import GaussianDronePlanner

    alpha = 0.2
    p = GaussianDronePlanner(DroneScenario(), alpha=alpha)
    ref = ns.Model(S=ns.S, alpha=alpha)
    rng = np.random.default_rng(3)
    Z = jnp.asarray(
        np.asarray(p.initial_guess(us_init=None))
        + np.concatenate([0.1 * rng.standard_normal(p.n_us),
                          0.001 * rng.random(p.n_alpha)])
    )
    g_final_ref, g_obs_ref = ref.get_all_state_constraints(Z)
    g_ctrl_ref, _, _ = ref.get_control_and_risk_constraints(Z)
    g_ref = jnp.concatenate([g_final_ref, g_obs_ref, g_ctrl_ref])
    g_ours = p.g(Z)
    assert g_ours.shape == g_ref.shape
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_ref), rtol=1e-9, atol=1e-10
    )
    np.testing.assert_allclose(float(p.f(Z)), float(ref.f(Z)), rtol=1e-10)


def test_car_gaussian_coeffs_match_reference():
    """Executed-reference parity for the car Gaussian QP define phase:
    the linearized (final | separation) constraint blocks over (us, alpha_t)
    and their rhs (driving_gaussian.py:303-354) must match our build_qp
    rows (ungated iteration)."""
    ns = ro.load_reference_script("car/driving_gaussian.py")
    from riskaversetrajopt_tpu.core.config import CarScenario
    from riskaversetrajopt_tpu.models.car_gaussian import GaussianCarPlanner

    alpha = 0.1
    p = GaussianCarPlanner(CarScenario(), alpha=alpha)
    ref = ns.Model("gaussian", alpha)
    rng = np.random.default_rng(4)
    us_mat = jnp.asarray(1e-2 + 0.05 * rng.standard_normal((p.S, p.n_u)))
    alphas = jnp.asarray((alpha / p.S) * (1.0 + 0.1 * rng.random(p.S)))

    (F_ref, f_low, f_up, G_ref, g_up_ref) = ref.get_all_constraints_coeffs(
        us_mat, alphas
    )
    P, q, A, l, u = p.build_qp(us_mat, alphas, jnp.asarray(3))
    n_us = p.n_u * p.S
    # final rows: Jacobian over (us | alphas), rhs two-sided
    np.testing.assert_allclose(
        np.asarray(A[:4, : n_us + p.S]), np.asarray(F_ref),
        rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(np.asarray(l[:4]), np.asarray(f_low),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(u[:4]), np.asarray(f_up),
                               rtol=1e-9, atol=1e-11)
    # separation rows
    np.testing.assert_allclose(
        np.asarray(A[4 : 4 + p.S, : n_us + p.S]), np.asarray(G_ref),
        rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(u[4 : 4 + p.S]), np.asarray(g_up_ref),
        rtol=1e-9, atol=1e-11,
    )
    # the unused trailing slack column is zero in every row (layout parity,
    # driving_gaussian.py:363-366)
    assert float(jnp.max(jnp.abs(A[: 4 + p.S, -1]))) == 0.0


def test_drone_mc_oracle_matches_reference():
    """Executed-reference parity for the ACCEPTANCE ORACLE itself: the
    reference's Monte-Carlo block (drone_risk.py:643-725) is exec'd far
    enough to capture its verification, AVaR-QP and cost functions
    (salvaged past its own results-FileNotFoundError); on identical fresh
    samples and a common control sequence, our monte_carlo must reproduce
    the safe-fraction (exact), the max-constraint statistics, the AVaR
    (reference solves its estimation QP through the stub OSQP engine) and
    the control cost."""
    ns = ro.load_reference_mc("drone/drone_risk.py", mc_M=500)
    from riskaversetrajopt_tpu.core.config import DroneScenario, SCPConfig
    from riskaversetrajopt_tpu.scp.driver import SAATrajOpt

    model = DroneModel(DroneScenario())
    opt = SAATrajOpt(model, method="saa")
    M_mc = 500
    om = opt.sample(jax.random.PRNGKey(7), M=M_mc)
    alpha = 0.2
    rng = np.random.default_rng(9)
    us = jnp.asarray(
        np.asarray(model.initial_guess()) * (2.0 + rng.random((model.S, 1)))
    )

    us_rep = jnp.repeat(us[None], M_mc, axis=0)
    B_vec, cons_vec = jax.vmap(
        ns.monte_carlo_no_collisions_constraint_verification
    )(us_rep, om.mass, om.dWs, om.obs_Q)
    avar_ref = ns.monte_carlo_avar(np.asarray(cons_vec), alpha)
    cost_ref = ns.monte_carlo_cost(us)

    mc = opt.monte_carlo(us, om, alpha)
    np.testing.assert_allclose(
        float(mc["safe_frac"]), float(jnp.mean(B_vec)), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(mc["max_constraints"]), np.asarray(cons_vec),
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(float(mc["avar"]), float(avar_ref),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(mc["cost"]), float(cost_ref),
                               rtol=1e-10)


def test_drone_main_plot_euclidean_mc_matches_reference():
    """Executed-reference parity for the paper-figure workload's Euclidean
    MC verification (drone_main_plot.py:633-652): the sqrt obstacle
    statistic, the raw-max safe test at OSQP_TOL + 1e-6, and the sort-based
    VaR estimator must match ours on identical samples."""
    ns = ro.load_reference_mc("drone/drone_main_plot.py", mc_M=400)
    from riskaversetrajopt_tpu.ops.cvar import var_sorted
    from riskaversetrajopt_tpu.ops.rollout import rollout_batch

    model = DroneModel(DroneScenario())
    M_mc = 400
    om = model.sample(jax.random.PRNGKey(11), M=M_mc, method="saa")
    alpha = 0.1
    rng = np.random.default_rng(12)
    us = jnp.asarray(
        np.asarray(model.initial_guess()) * (2.0 + rng.random((model.S, 1)))
    )
    us_rep = jnp.repeat(us[None], M_mc, axis=0)
    _, B_ref, cons_ref = jax.vmap(
        ns.monte_carlo_no_collisions_constraint_verification
    )(us_rep, om.mass, om.dWs, om.obs_Q)

    xs = rollout_batch(model, us, om)
    cons_ours = jax.vmap(
        lambda x, o: jnp.max(model.ineq_constraints_euclidean(x, o))
    )(xs, om)
    np.testing.assert_allclose(
        np.asarray(cons_ours), np.asarray(cons_ref), rtol=1e-9, atol=1e-12
    )
    safe_ours = cons_ours <= model.scn.osqp_tol + 1e-6
    assert bool(jnp.all(safe_ours == B_ref))
    np.testing.assert_allclose(
        float(var_sorted(cons_ours, alpha)),
        float(ns.monte_carlo_var(np.asarray(cons_ref), alpha)),
        rtol=1e-12,
    )
