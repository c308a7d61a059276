"""Multi-device sharding tests on the 8-device virtual CPU mesh: the SCP
solve with sample-sharded uncertainty must produce the same solution as the
single-device run (XLA inserts the Schur-block all-reduces)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riskaversetrajopt_tpu.core.config import DroneScenario, SCPConfig
from riskaversetrajopt_tpu.models.drone import DroneModel
from riskaversetrajopt_tpu.parallel.mesh import make_mesh, shard_samples
from riskaversetrajopt_tpu.scp.driver import SAATrajOpt


def test_mesh_creation():
    mesh = make_mesh()
    assert mesh.shape["samples"] == 8
    assert mesh.shape["batch"] == 1


def test_sharded_scp_matches_single_device():
    model = DroneModel(DroneScenario())
    opt = SAATrajOpt(
        model,
        method="saa",
        scp_cfg=SCPConfig(
            num_iters=8, gate_iters=2, gate_row_scale=1e-7,
            gate_bound_l=-0.1, gate_bound_u=0.1,
        ),
    )
    M = 16  # divisible by 8 devices
    omegas = opt.sample(jax.random.PRNGKey(0), M=M)

    res_single = opt.solve(omegas, alpha=0.2)

    mesh = make_mesh()
    omegas_sharded = shard_samples(omegas, mesh)
    # verify the input really is distributed
    leaf = jax.tree.leaves(omegas_sharded)[0]
    assert len(leaf.sharding.device_set) == 8

    res_sharded = opt.solve(omegas_sharded, alpha=0.2)

    np.testing.assert_allclose(
        np.asarray(res_single.us), np.asarray(res_sharded.us), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(res_single.l2_errors),
        np.asarray(res_sharded.l2_errors),
        rtol=1e-6,
        atol=1e-10,
    )


def test_pinned_sharded_scp_matches_unpinned():
    """Explicit-collective fallback: with sample_pin set, every (M, ...)
    operator intermediate carries a with_sharding_constraint over the
    'samples' axis — the Schur split no longer depends on GSPMD's cost
    model. Must be numerically identical to the unpinned path."""
    model = DroneModel(DroneScenario())
    scp_cfg = SCPConfig(
        num_iters=6, gate_iters=2, gate_row_scale=1e-7,
        gate_bound_l=-0.1, gate_bound_u=0.1,
    )
    mesh = make_mesh()
    opt_pinned = SAATrajOpt(
        model, method="saa", scp_cfg=scp_cfg,
        sample_pin=(mesh, "samples"),
    )
    opt_plain = SAATrajOpt(model, method="saa", scp_cfg=scp_cfg)
    M = 16
    omegas = opt_plain.sample(jax.random.PRNGKey(3), M=M)
    om_sh = shard_samples(omegas, mesh)

    res_pinned = opt_pinned.solve(om_sh, alpha=0.2)
    res_plain = opt_plain.solve(omegas, alpha=0.2)
    np.testing.assert_allclose(
        np.asarray(res_pinned.us), np.asarray(res_plain.us),
        rtol=1e-8, atol=1e-10,
    )


def _collective_sizes(hlo_text):
    """(elements, op, op_name) for every collective in compiled HLO text.

    HLO lines reference operands by %name, so every shape token on a
    collective's line belongs to its RESULT (tuple results contribute one
    token per element); the max token is the largest array moved."""
    import re

    rows = []
    for ln in hlo_text.splitlines():
        m = re.search(
            r"= \(?([a-z0-9]+\[[0-9,]*\][^)]*?)\)? "
            r"(all-reduce|all-gather|reduce-scatter|all-to-all|"
            r"collective-permute)\(",
            ln,
        )
        if not m:
            continue
        elems = 0
        for sm in re.finditer(r"[a-z][0-9]+\[([0-9,]*)\]", m.group(1)):
            n = 1
            for d in sm.group(1).split(","):
                if d:
                    n *= int(d)
            elems = max(elems, n)
        opn = re.search(r'op_name="([^"]*)"', ln)
        rows.append((elems, m.group(2), opn.group(1) if opn else ""))
    return rows


def test_hlo_collective_audit_no_jacobian_communication():
    """Compiled-HLO audit of the sharded SCP step (SURVEY §2.3/§5 comm
    design): the sample-axis Schur split must keep the (M, K, n) Jacobian
    stack G chip-local — only O(M)-by-60-wide blocks and the (n+2)^2
    Schur block may ever be communicated.

    Measured picture at M=128 on the 8-device virtual mesh: the largest
    collectives are 8 all-gathers of exactly M*60 elements (the 60-wide
    per-sample segment of concatenated (m,)-vectors and/or the (M, n)
    y-v coupling block — for the drone K == n == 60 so the two classes
    coincide), emitted at factorization epochs and termination checks,
    NOT in the per-iteration fori body; everything else is <= the
    (n+2)^2 = 3844-element Schur all-reduce + scalars. A change that
    makes GSPMD gather the Jacobian stack (M*K*n elements, 60x larger)
    fails this test."""
    model = DroneModel(DroneScenario())
    opt = SAATrajOpt(
        model,
        method="saa",
        scp_cfg=SCPConfig(
            num_iters=4, gate_iters=2, gate_row_scale=1e-7,
            gate_bound_l=-0.1, gate_bound_u=0.1,
        ),
    )
    M = 128
    n = model.S * model.n_u
    K = model.K
    om = opt.sample(jax.random.PRNGKey(0), M=M)
    mesh = make_mesh()
    om_sh = shard_samples(om, mesh)
    consts = {"model": opt.model.consts(), "p_diag_u": opt.p_diag_u}
    compiled = opt._solve_jit.lower(
        opt, om_sh, jnp.asarray(0.2, opt.dtype), consts, M
    ).compile()
    rows = _collective_sizes(compiled.as_text())

    assert rows, "partitioned program contains no collectives at all?"
    # every above-Schur-block collective must be one of the 60-wide
    # O(M) blocks — nothing larger (e.g. (M, K, n) G-shards, (M, K+2)
    # stacked blocks) may be communicated
    cap = M * max(K, n)
    big = [r for r in rows if r[0] > (n + 2) ** 2]
    bad = [r for r in big if r[0] > cap]
    assert not bad, f"unexpected large collectives: {bad[:5]}"
    # hard bound: nothing in the class of a per-device G shard
    g_shard = (M // 8) * K * n
    assert all(r[0] < g_shard for r in rows), (
        "a collective moves G-class data"
    )


def test_batched_alpha_sweep_vmap():
    """The (alpha x repeat) sweep solved as one batched computation — the
    reference loops serially over 4 alphas x 30 repeats
    (drone_risk.py:498-503)."""
    model = DroneModel(DroneScenario())
    opt = SAATrajOpt(
        model,
        method="saa",
        scp_cfg=SCPConfig(
            num_iters=6, gate_iters=2, gate_row_scale=1e-7,
            gate_bound_l=-0.1, gate_bound_u=0.1,
        ),
    )
    M = 4
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    omegas_batch = jax.vmap(lambda k: opt.sample(k, M=M))(keys)
    alphas = jnp.array([0.1, 0.2, 0.3])

    batched = jax.vmap(lambda om, a: opt.solve(om, a))(omegas_batch, alphas)
    assert batched.us.shape == (3, model.S, model.n_u)

    # row 1 matches the unbatched solve for the same data
    om1 = jax.tree.map(lambda x: x[1], omegas_batch)
    res1 = opt.solve(om1, alpha=0.2)
    np.testing.assert_allclose(
        np.asarray(batched.us[1]), np.asarray(res1.us), rtol=1e-7, atol=1e-9
    )
