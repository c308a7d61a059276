"""Fused-ADMM Pallas kernel tests (CPU: reference-vs-ScaledOps equivalence
and interpret-mode kernel-vs-reference equivalence)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riskaversetrajopt_tpu.core.config import SolverConfig
from riskaversetrajopt_tpu.ops import admm as admm_mod
from riskaversetrajopt_tpu.ops.pallas.experimental import saa_admm as pk
from riskaversetrajopt_tpu.ops.saa_qp import (
    SAAQPOps,
    build_bounds,
    build_objective,
)
from tests.test_saa_qp import make_problem

CFG = SolverConfig()


def setup(M=12, scp_iter=3):
    st, data = make_problem(M=M)
    data32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), data)
    ops = SAAQPOps(st, data32, jnp.asarray(scp_iter))
    _, q = build_objective(st, data32)
    l, u = build_bounds(st, data32, jnp.asarray(scp_iter))
    scaling = admm_mod.ruiz_equilibrate(ops, q, l, u, iters=5)
    rho = jnp.asarray(CFG.rho, jnp.float32)
    p, (D, E, c) = pk.scaled_structure(
        st, data32, jnp.asarray(scp_iter), scaling, rho, CFG, TM=8
    )
    d = pk.kernel_dims(st, TM=8)
    return st, data32, ops, q, l, u, scaling, rho, p, d


def reference_scaled_iteration(ops, q, l, u, scaling, rho, cfg, n_iters):
    """Replicates admm_solve's scaled iteration directly with ScaledOps."""
    sops = admm_mod.ScaledOps(ops, scaling)
    D, E, c = scaling.D, scaling.E, scaling.c
    qs = (c * D * q).astype(jnp.float32)
    ls = (E * l).astype(jnp.float32)
    us = (E * u).astype(jnp.float32)
    n = q.shape[0]
    sigma_vec = jnp.full(n, cfg.sigma, jnp.float32)
    alpha = jnp.float32(cfg.alpha_relax)
    rv = admm_mod.rho_vector(ls, us, rho).astype(jnp.float32)
    factor = sops.factorize(rv, sigma_vec)
    x = jnp.zeros(n, jnp.float32)
    y = jnp.zeros_like(ls)
    z = jnp.clip(sops.matvec_A(x), ls, us)
    for _ in range(n_iters):
        rhs = sigma_vec * x - qs + sops.rmatvec_A(rv * z - y)
        xt = sops.kkt_solve(factor, rhs, rv, sigma_vec)
        zt = sops.matvec_A(xt)
        x = alpha * xt + (1 - alpha) * x
        z_relax = alpha * zt + (1 - alpha) * z
        z_new = jnp.clip(z_relax + y / rv, ls, us)
        y = y + rv * (z_relax - z_new)
        z = z_new
    return x, z, y


@pytest.mark.parametrize("scp_iter", [0, 3])
def test_one_iter_ref_matches_scaled_ops(scp_iter):
    """Both paths run f32 with inexact KKT solves (ScaledOps: f32 Cholesky +
    one refinement, kernel: f64-computed explicit Schur inverse — verified
    MORE accurate against f64 ground truth), so trajectories agree only to
    the solve-error level, not bitwise."""
    st, data32, ops, q, l, u, scaling, rho, p, d = setup(scp_iter=scp_iter)
    n_iters = 5
    x_ref, z_ref, y_ref = reference_scaled_iteration(
        ops, q, l, u, scaling, rho, CFG, n_iters
    )
    state = pk.init_scaled_state(p, d)
    for _ in range(n_iters):
        state = pk.one_iter_ref(p, state, d)
    x_k, z_k, yd_k = pk.state_to_flat(p, state, st, d)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(yd_k), np.asarray(y_ref),
                               rtol=5e-2, atol=5e-2)


def test_flat_state_roundtrip():
    st, data32, ops, q, l, u, scaling, rho, p, d = setup()
    state = pk.init_scaled_state(p, d)
    for _ in range(3):
        state = pk.one_iter_ref(p, state, d)
    x, z, yd = pk.state_to_flat(p, state, st, d)
    state2 = pk.flat_to_state(p, x, z, yd, st, d)
    x2, z2, yd2 = pk.state_to_flat(p, state2, st, d)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(yd), np.asarray(yd2), rtol=1e-6)


def test_kernel_interpret_matches_reference():
    st, data32, ops, q, l, u, scaling, rho, p, d = setup()
    chunk = 4
    state0 = pk.init_scaled_state(p, d)
    state_ref = state0
    for _ in range(chunk):
        state_ref = pk.one_iter_ref(p, state_ref, d)
    state_k = pk.admm_chunk_pallas(p, state0, d, chunk, interpret=True)
    # tile-wise vs whole-array f32 summation order differs by ~1e-5; the
    # equality rows amplify that by their 1e3x rho in the dual update
    for a, b, name in zip(state_k, state_ref, state_ref._fields):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2,
            err_msg=f"field {name}",
        )


def test_kernel_interpret_resident_matches_streaming():
    """The VMEM-resident Gs variant computes identically to streaming
    (same math, different G access pattern)."""
    st, data32, ops, q, l, u, scaling, rho, p, d = setup()
    chunk = 3
    state0 = pk.init_scaled_state(p, d)
    s_stream = pk.admm_chunk_pallas(
        p, state0, d, chunk, interpret=True, resident=False
    )
    s_res = pk.admm_chunk_pallas(
        p, state0, d, chunk, interpret=True, resident=True
    )
    for a, b, name in zip(s_res, s_stream, s_stream._fields):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6,
            err_msg=f"field {name}",
        )


def test_pallas_solver_backend_matches_xla(monkeypatch):
    """solve_saa_qp_pallas (interpret mode) reaches the same solution as the
    XLA structured ADMM at the same tolerance, and the driver backend
    dispatches to it."""
    import jax.numpy as jnp

    from riskaversetrajopt_tpu.ops.saa_qp import solve_saa_qp

    st, data = make_problem(M=12)
    data32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), data)
    # NOTE on tolerances: this small-M problem in f32 stalls in the dual for
    # both backends near eps 1e-3 (they take different stall paths: explicit
    # Schur inverse vs Cholesky+refinement, different check cadences), so the
    # contract tested is solution QUALITY at a fixed budget, not the solved
    # flag. The driver-level test below exercises SCP-level correctness.
    cfg = SolverConfig(eps_abs=1e-3, eps_rel=1e-3, max_iter=4000)
    sol_k = pk.solve_saa_qp_pallas(
        st, data32, jnp.asarray(3), cfg, chunk=50, TM=8, interpret=True
    )
    assert float(sol_k.prim_res) < 2e-2
    sol_x = solve_saa_qp(st, data32, jnp.asarray(3), cfg)
    # both feasible to tolerance with matching objective
    from tests.test_saa_qp import dense_reference_A
    from riskaversetrajopt_tpu.ops.saa_qp import build_objective

    A, ld, ud = dense_reference_A(st, jax.tree.map(np.asarray, data32), 3)
    p_diag, q = build_objective(st, data32)
    for sol in (sol_k, sol_x):
        Ax = A @ np.asarray(sol.x, np.float64)
        assert np.max(Ax - ud) < 2e-2
        assert np.max(ld - Ax) < 2e-2
    obj = lambda v: 0.5 * np.sum(np.asarray(p_diag) * v * v) + np.asarray(q) @ v
    o_k = obj(np.asarray(sol_k.x, np.float64))
    o_x = obj(np.asarray(sol_x.x, np.float64))
    assert abs(o_k - o_x) <= 5e-2 * (1 + abs(o_x))


def test_driver_pallas_backend_end_to_end():
    """Full SCP solve through the '_admm-pallas' backend (interpret on CPU)."""
    import jax.numpy as jnp

    from riskaversetrajopt_tpu.core.config import DroneScenario, SCPConfig
    from riskaversetrajopt_tpu.models.drone import DroneModel
    from riskaversetrajopt_tpu.scp.driver import SAATrajOpt

    # the f32 path is exercised without x64 (model closure constants are
    # f64 under the test-suite x64 default and would promote the rollout)
    with jax.enable_x64(False):
        model = DroneModel(DroneScenario())
        opt = SAATrajOpt(
            model,
            method="saa",
            qp_backend="_admm-pallas",
            dtype=jnp.float32,
            pallas_interpret=True,
            scp_cfg=SCPConfig(
                num_iters=10, gate_iters=2, gate_row_scale=1e-7,
                gate_bound_l=-0.1, gate_bound_u=0.1,
            ),
        )
        omegas = opt.sample(jax.random.PRNGKey(0), M=8)
        res = opt.solve(omegas, alpha=0.2)
        l2 = np.asarray(res.l2_errors)
    assert np.isfinite(l2).all()
    assert l2[-1] < 5e-2, f"L2 errors: {l2}"


# --- F-layout (lane-flat) kernel: ops/pallas/saa_admm_f.py -----------------

def test_f_state_roundtrip():
    from riskaversetrajopt_tpu.ops.pallas.experimental import saa_admm_f as pkf

    st, data32, ops, q, l, u, scaling, rho, p, d = setup()
    state = pk.init_scaled_state(p, d)
    for _ in range(3):
        state = pk.one_iter_ref(p, state, d)
    sf = pkf.state_to_f(state, d)
    state2 = pkf.f_to_state(sf, d)
    for a, b, name in zip(state2, state, state._fields):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6,
            err_msg=f"field {name}",
        )


def test_f_kernel_interpret_matches_reference():
    from riskaversetrajopt_tpu.ops.pallas.experimental import saa_admm_f as pkf

    st, data32, ops, q, l, u, scaling, rho, p, d = setup()
    chunk = 4
    state0 = pk.init_scaled_state(p, d)
    state_ref = state0
    for _ in range(chunk):
        state_ref = pk.one_iter_ref(p, state_ref, d)
    pf = pkf.to_f(p, d)
    sf = pkf.admm_chunk_pallas_f(
        pf, pkf.state_to_f(state0, d), d, chunk, interpret=True
    )
    state_k = pkf.f_to_state(sf, d)
    for a, b, name in zip(state_k, state_ref, state_ref._fields):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2,
            err_msg=f"field {name}",
        )


def test_f_solver_backend_matches_xla():
    """solve_saa_qp_pallas_f (interpret mode) reaches the same solution
    QUALITY as the default XLA structured solver at a fixed budget (same
    contract as test_pallas_solver_backend_matches_xla: this small-M f32
    problem stalls in the dual near eps 1e-3 for every backend)."""
    from riskaversetrajopt_tpu.ops.pallas.experimental import saa_admm_f as pkf
    from riskaversetrajopt_tpu.ops.saa_qp import build_objective, solve_saa_qp
    from tests.test_saa_qp import dense_reference_A

    st, data = make_problem(M=12)
    data32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), data)
    cfg = SolverConfig(eps_abs=1e-3, eps_rel=1e-3, max_iter=4000)
    s_f = pkf.solve_saa_qp_pallas_f(
        st, data32, jnp.asarray(3), cfg, chunk=50, interpret=True
    )
    assert float(s_f.prim_res) < 2e-2
    s_ref = solve_saa_qp(st, data32, jnp.asarray(3), cfg)
    A, ld, ud = dense_reference_A(st, jax.tree.map(np.asarray, data32), 3)
    p_diag, q = build_objective(st, data32)
    for sol in (s_f, s_ref):
        Ax = A @ np.asarray(sol.x, np.float64)
        assert np.max(Ax - ud) < 2e-2
        assert np.max(ld - Ax) < 2e-2
    obj = lambda v: 0.5 * np.sum(np.asarray(p_diag) * v * v) + np.asarray(q) @ v
    o_f = obj(np.asarray(s_f.x, np.float64))
    o_x = obj(np.asarray(s_ref.x, np.float64))
    assert abs(o_f - o_x) <= 5e-2 * (1 + abs(o_x))
