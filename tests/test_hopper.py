"""Hopper model + NLP tests: constraint-stack shapes and values, friction
field sampling, and a reduced-budget baseline solve reaching feasibility.

(The full 3000-iteration baseline->SAA workflow is exercised by the hopper
experiment; here we bound runtime and check structure + progress.)"""

import jax
import jax.numpy as jnp
import numpy as np

from riskaversetrajopt_tpu.core.config import HopperScenario
from riskaversetrajopt_tpu.models.hopper import HopperModel
from riskaversetrajopt_tpu.ops.nlp_ipm import (
    NLPConfig,
    classify_rows,
    solve_nlp,
)


def test_constraint_stack_shapes():
    model = HopperModel(HopperScenario())
    M = model.M
    field = model.sample_friction(jax.random.PRNGKey(0), M, "saa")
    Z0 = model.initial_guess(M)
    g = model.g_all(Z0, field, "saa", 0.1)
    g_L, g_U, n_eq, xL, xU = model.bounds("saa", M)
    assert g.shape == g_L.shape == g_U.shape
    s = model.scn
    # reference row count: dyn + x0 + xf + no-slip + contact + flight +
    # (1 + M + M*C + 1) + controls + slack + 3S
    C = model.num_contacts
    expected = (
        s.S * s.n_x + s.n_x + 2 + 21 + 21 + 10
        + (1 + M + M * C + 1) + s.n_u * s.S + 1 + 3 * s.S
    )
    assert g.shape[0] == expected
    assert n_eq == s.S * s.n_x + s.n_x + 2 + 21 + 21
    assert model.num_vars == 400  # (S+1)*n_x + S*n_u + M + 2 (hopper.py:58)


def test_initial_guess_dynamics_defect_structure():
    """The phase-structured initial guess (hopper.py:136-164) applies the
    nominal force on BOTH the leg actuator and the contact force, so the net
    vertical acceleration is +g and every RK4 defect is ~g*dt in the
    velocity block (a property of the reference guess, reproduced exactly)."""
    model = HopperModel(HopperScenario())
    s = model.scn
    Z0 = model.initial_guess(model.M)
    xs, us, *_ = model.split_z(Z0)
    defects = model.dynamics_defects(xs, us).reshape(model.S, model.n_x)
    expected = s.gravity * s.dt  # 9.81 * (2/30) = 0.654
    per_step = np.max(np.abs(np.asarray(defects)), axis=1)
    np.testing.assert_allclose(per_step, expected, rtol=1e-6)


def test_friction_field_sampling():
    model = HopperModel(HopperScenario())
    f_saa = model.sample_friction(jax.random.PRNGKey(0), 100, "saa")
    f_base = model.sample_friction(jax.random.PRNGKey(0), 100, "baseline")
    s = model.scn
    # baseline: mu == mu_nom everywhere
    mu0 = s.mu_nom + jnp.sum(
        f_base.intensities[0] * jnp.cos(f_base.thetas[0] * 0.5 + f_base.taus[0])
    )
    np.testing.assert_allclose(float(mu0), s.mu_nom)
    # saa intensities bounded by 0.025*sqrt(2/F)
    bound = 0.025 * np.sqrt(2.0 / s.num_mu_features)
    assert float(jnp.max(f_saa.intensities)) <= bound + 1e-12
    assert float(jnp.min(f_saa.intensities)) >= 0.0


def test_nlp_params_path_matches_closures():
    """The arg-rooted (jit-argument) NLP path — make_nlp_params +
    solve_nlp(params=..., row_perm=...) under an outer jax.jit — must
    reproduce the closure path (TPU ConstBind rationale in ops/nlp_ipm)."""
    model = HopperModel(HopperScenario())
    M = 4
    field = model.sample_friction(jax.random.PRNGKey(3), M, "saa")
    Z0 = model.initial_guess(M)
    cfg = NLPConfig(tol=1e-4, max_iter=15)

    f, g, gL, gU, n_eq, xL, xU = model.make_nlp(field, "saa", 0.1)
    ref = solve_nlp(f, g, gL, gU, n_eq, xL, xU, Z0, cfg)

    fp, gp, params, gL2, gU2, n_eq2, xL2, xU2 = model.make_nlp_params(
        field, "saa", 0.1
    )
    row_perm = classify_rows(gL2, gU2, n_eq2)
    jit_solve = jax.jit(
        lambda Z0, params, gL, gU, xL, xU: solve_nlp(
            fp, gp, gL, gU, n_eq2, xL, xU, Z0, cfg,
            params=params, row_perm=row_perm,
        )
    )
    res = jit_solve(Z0, params, gL2, gU2, xL2, xU2)
    assert int(res.iters) == int(ref.iters)
    np.testing.assert_allclose(
        np.asarray(res.Z), np.asarray(ref.Z), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        float(res.prim_res), float(ref.prim_res), rtol=1e-5, atol=1e-10
    )


def test_nlp_batched_solves_over_fields():
    """vmap over the params pytree = batched NLP solves over independent
    friction-field draws (the batched-problem axis, SURVEY.md 2.3, extended
    to the NLP backend)."""
    model = HopperModel(HopperScenario())
    M, B = 3, 2
    fields = model.sample_friction(jax.random.PRNGKey(5), B * M, "saa")
    batched = jax.tree.map(lambda x: x.reshape(B, M, -1), fields)
    Z0 = model.initial_guess(M)
    cfg = NLPConfig(tol=1e-4, max_iter=6)

    fp, gp, params0, gL, gU, n_eq, xL, xU = model.make_nlp_params(
        fields._replace(
            intensities=batched.intensities[0],
            thetas=batched.thetas[0],
            taus=batched.taus[0],
        ),
        "saa",
        0.1,
    )
    row_perm = classify_rows(gL, gU, n_eq)

    def one(field_b):
        params = {"field": field_b, "mc": params0["mc"]}
        return solve_nlp(fp, gp, gL, gU, n_eq, xL, xU, Z0, cfg,
                         params=params, row_perm=row_perm)

    res = jax.vmap(one)(
        type(fields)(batched.intensities, batched.thetas, batched.taus)
    )
    assert res.Z.shape == (B, Z0.shape[0])
    assert bool(jnp.all(jnp.isfinite(res.Z)))
    # each batch element makes real progress from the teleporting guess
    assert float(jnp.max(res.prim_res)) < 10.0


def test_hopper_baseline_reaches_feasibility():
    """Reduced iteration budget: the solver must reach near-feasibility of
    the contact-implicit dynamics from the teleporting initial guess (full
    convergence takes ~2800 iterations, matching the reference's
    max_iter=3000 IPOPT budget)."""
    model = HopperModel(HopperScenario())
    field = model.sample_friction(jax.random.PRNGKey(1), model.M, "baseline")
    f, g, gL, gU, n_eq, xL, xU = model.make_nlp(field, "baseline", 0.1)
    Z0 = model.initial_guess(model.M)
    res = solve_nlp(f, g, gL, gU, n_eq, xL, xU, Z0,
                    NLPConfig(tol=1e-4, max_iter=60))
    assert float(res.prim_res) < 1e-2
    xs, us, ys, slack, t_risk = model.split_z(res.Z)
    assert bool(jnp.all(jnp.isfinite(res.Z)))
    # no-slip equality holds approximately on stance phases
    assert float(jnp.max(jnp.abs(model.dynamics_defects(xs, us)))) < 1e-2


def test_cold_baseline_damped_converges_fast():
    """First-steps fraction-to-boundary damping (NLPConfig.damp_iters): the
    cold baseline solve from the teleporting initial guess commits to its
    basin during the first few LARGE barrier steps; capping those steps
    keeps the iterate on the path to the jump-1.053 optimum. Measured
    (round 4): undamped x64 takes ~2770 iters (the reference's IPOPT needs
    its max_iter=3000 budget too, hopper/hopper.py:646-669); with
    damp_iters=50/damp_max=0.1 the SAME solve certifies at tol=1e-4 in ~69
    iters — a 40x iteration reduction that also rescues the f32 cold start
    (see test_f32_cold_baseline_damped_true_dtype)."""
    model = HopperModel(HopperScenario())
    field = model.sample_friction(jax.random.PRNGKey(1), model.M, "baseline")
    f, g, gL, gU, n_eq, xL, xU = model.make_nlp(field, "baseline", 0.1)
    Z0 = model.initial_guess(model.M)
    res = solve_nlp(f, g, gL, gU, n_eq, xL, xU, Z0,
                    NLPConfig(tol=1e-4, max_iter=120,
                              damp_iters=50, damp_max=0.1))
    assert bool(res.solved)
    xs, us, ys, slack, t_risk = model.split_z(res.Z)
    # Guard the BASIN, not the exact jump value: the failure modes this
    # test exists to catch land at jump ~0.03 / ~0.54 (wrong basins), so
    # jump > 0.9 distinguishes them while tolerating benign numerical
    # drift across jaxlib versions (ADVICE r4).
    assert float(xs[-1, 0]) > 0.9  # the reference jump-1.053 basin


def test_f32_cold_baseline_damped_true_dtype():
    """TPU-f32 hopper cold start (VERDICT r3 #4): in TRUE f32 (no silent
    x64 promotion inside the model closures — hence a subprocess with x64
    disabled; this suite runs under jax_enable_x64), KKT equilibration +
    first-steps damping certify the COLD baseline solve in the SAME
    jump-1.053 basin as x64, in ~60 iterations. This closes the round-3
    negative result (f32 cold solves landed at jump~0.03 at any budget) —
    one solver now handles every hopper instance in f32, like the
    reference's IPOPT does in x64 (hopper/hopper.py:646-669)."""
    import os
    import re
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "probe_hopper_f32.py"),
         "f32", "damp_iters=50", "damp_max=0.1", "iters=120"],
        capture_output=True, text=True, timeout=900,
        env={k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
    )
    m = re.search(
        r"RESULT iters=(\d+) solved=(\w+).* jump=([-\d.]+)", out.stdout
    )
    assert m, f"no RESULT line:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    assert m.group(2) == "True"
    assert abs(float(m.group(3)) - 1.053) < 0.11  # within ~10% of x64's


def test_f32_saa_warm_start_two_phase():
    """TPU-f32 hopper story (no f64 on TPU): the UNDAMPED cold baseline
    phase in f32 falls into a poor local basin of the nonconvex contact
    problem (tiny jump ~0.03; fixed in round 4 by first-steps damping, see
    test_f32_cold_baseline_damped_true_dtype — this test covers the other
    deployable workflow), and the expensive M-scaled SAA phase — warm-started from a
    converged baseline solution, exactly the reference's two-phase workflow
    (hopper/README.md:9-25) — certifies in f32 with KKT equilibration at a
    solution near the x64 one (measured same instance: f32 jumped 0.391 in
    40 iters vs x64 0.471 in 113; both `solved` at tol 1e-3). The baseline
    fixture is this solver's own x64 output (jumped 1.053)."""
    import os

    from riskaversetrajopt_tpu.core.config import HopperScenario

    Zb = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                              "hopper_base_Z.npy"))
    model = HopperModel(HopperScenario())
    assert abs(Zb[model.S * model.n_x] - 1.0534) < 1e-2  # converged baseline
    field = model.sample_friction(jax.random.PRNGKey(0), model.M, "saa")
    f, g, gL, gU, n_eq, xL, xU = model.make_nlp(field, "saa", 0.3)
    b32 = [a.astype(jnp.float32) for a in (gL, gU, xL, xU)]
    res = solve_nlp(f, g, b32[0], b32[1], n_eq, b32[2], b32[3],
                    jnp.asarray(Zb, jnp.float32),
                    NLPConfig(tol=1e-3, max_iter=100, kkt_ruiz_iters=3))
    xs, us, ys, slack, t_risk = model.split_z(res.Z)
    assert bool(res.solved)
    assert float(xs[-1, 0]) > 0.3  # stays in the jumping basin
