"""TPU probe: Pallas fused-ADMM kernel envelope (standalone + embedded).

Runs ONE configuration per process (a device fault wedges the chip for
minutes; isolating probes keeps one failure from poisoning the batch):

    python tools/probe_pallas.py <mode> <M> <TM> [chunk] [iters]

modes:
  chunk     - one admm_chunk_pallas launch, correctness vs one_iter_ref + timing
  solve     - jit(solve_saa_qp_pallas) standalone, vs XLA solve_saa_qp
  embedded  - solve_saa_qp_pallas inside a jitted scan over 3 SCP-style calls

Prints PROBE_OK / PROBE_FAIL lines; tools/probe_pallas_batch.sh drives the
matrix.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")


def build_problem(M):
    from riskaversetrajopt_tpu.core.config import DroneScenario
    from riskaversetrajopt_tpu.models.drone import DroneModel
    from riskaversetrajopt_tpu.ops.rollout import linearize_batch
    from riskaversetrajopt_tpu.ops.saa_qp import SAAQPStatic, pack_saa_qp_data

    model = DroneModel(DroneScenario())
    om = model.sample(jax.random.PRNGKey(0), M=M)
    us = model.initial_guess().astype(jnp.float32)
    lin = linearize_batch(model, us, om)
    scn = model.scn
    p_diag_u = jnp.tile(2.0 * scn.dt * jnp.diag(scn.R), model.S)
    data = pack_saa_qp_data(lin, us.reshape(-1), p_diag_u, 0.1)
    data = jax.tree.map(lambda x: x.astype(jnp.float32), data)
    st = SAAQPStatic(
        n=model.S * model.n_u, M=M, K=model.K, n_fc=model.n_fc,
        n_x=model.n_x, row_scale=model.row_scale,
        slack_penalty=model.slack_penalty, u_max=scn.u_max,
        baseline=False, baseline_pad=1e-3,
        gate_iters=2, gate_scale=1e-7, gate_l=-0.1, gate_u=0.1,
    )
    return st, data


def probe_chunk(M, TM, chunk):
    from riskaversetrajopt_tpu.core.config import SolverConfig
    from riskaversetrajopt_tpu.ops import admm as admm_mod
    from riskaversetrajopt_tpu.ops.pallas import saa_admm as pk

    st, data = build_problem(M)
    cfg = SolverConfig()
    d = pk.kernel_dims(st, TM)
    print(f"[probe] dims: {d}", flush=True)
    ops_ = pk.SAAQPOps(st, data, jnp.asarray(3))
    _, q = pk.build_objective(st, data)
    l, u = pk.build_bounds(st, data, jnp.asarray(3))
    scaling = admm_mod.ruiz_equilibrate(ops_, q, l, u, iters=5)
    p, _ = pk.scaled_structure(st, data, jnp.asarray(3), scaling,
                               jnp.float32(0.1), cfg, TM=TM)
    s0 = pk.init_scaled_state(p, d)

    # jnp reference, N iterations
    def ref_n(s):
        def body(s, _):
            return pk.one_iter_ref(p, s, d), None
        return jax.lax.scan(body, s, None, length=chunk)[0]

    s_ref = jax.jit(ref_n)(s0)
    jax.block_until_ready(s_ref)
    print("[probe] reference done", flush=True)

    run = jax.jit(lambda s: pk.admm_chunk_pallas(p, s, d, chunk))
    s_k = run(s0)
    jax.block_until_ready(s_k)
    errs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s_k, s_ref
    )
    max_err = max(jax.tree.leaves(errs))
    # timing
    t0 = time.perf_counter()
    for _ in range(5):
        s_k = run(s0)
    jax.block_until_ready(s_k)
    dt = (time.perf_counter() - t0) / 5 / chunk
    ok = max_err < 1e-3
    print(f"PROBE_{'OK' if ok else 'FAIL'} chunk M={M} TM={TM} "
          f"max_err={max_err:.2e} us_per_iter={dt*1e6:.2f}", flush=True)


def probe_solve(M, TM, chunk, iters):
    from riskaversetrajopt_tpu.core.config import SolverConfig
    from riskaversetrajopt_tpu.ops.pallas import saa_admm as pk
    from riskaversetrajopt_tpu.ops.saa_qp import solve_saa_qp

    st, data = build_problem(M)
    cfg = SolverConfig(eps_abs=1e-4, eps_rel=1e-4, max_iter=iters)

    sol_p = jax.jit(
        lambda: pk.solve_saa_qp_pallas(st, data, jnp.asarray(3), cfg,
                                       chunk=chunk, TM=TM)
    )()
    jax.block_until_ready(sol_p)
    print(f"[probe] pallas solved={bool(sol_p.solved)} "
          f"iters={int(sol_p.iters)} prim={float(sol_p.prim_res):.2e} "
          f"dual={float(sol_p.dual_res):.2e}", flush=True)

    sol_x = jax.jit(
        lambda: solve_saa_qp(st, data, jnp.asarray(3), cfg)
    )()
    jax.block_until_ready(sol_x)
    n = st.n
    du = float(jnp.max(jnp.abs(sol_p.x[:n] - sol_x.x[:n])))
    t0 = time.perf_counter()
    s2 = jax.jit(lambda: pk.solve_saa_qp_pallas(st, data, jnp.asarray(3), cfg,
                                                chunk=chunk, TM=TM))()
    jax.block_until_ready(s2)
    t_p = time.perf_counter() - t0
    t0 = time.perf_counter()
    s3 = jax.jit(lambda: solve_saa_qp(st, data, jnp.asarray(3), cfg))()
    jax.block_until_ready(s3)
    t_x = time.perf_counter() - t0
    ok = bool(sol_p.solved) and du < 5e-2
    print(f"PROBE_{'OK' if ok else 'FAIL'} solve M={M} TM={TM} du={du:.2e} "
          f"t_pallas={t_p:.3f}s t_xla={t_x:.3f}s", flush=True)


def probe_embedded(M, TM, chunk, iters):
    """solve_saa_qp_pallas inside a bigger jitted program (scan over calls
    with data perturbations) — the round-1 failure mode."""
    from riskaversetrajopt_tpu.core.config import SolverConfig
    from riskaversetrajopt_tpu.ops.pallas import saa_admm as pk

    st, data = build_problem(M)
    cfg = SolverConfig(eps_abs=1e-4, eps_rel=1e-4, max_iter=iters)

    def one(carry, k):
        x0, y0 = carry
        dd = data._replace(g_up=data.g_up + 1e-4 * k)
        sol = pk.solve_saa_qp_pallas(st, dd, jnp.asarray(3), cfg,
                                     x0=x0, y0=y0, chunk=chunk, TM=TM)
        return (sol.x, sol.y), (sol.iters, sol.prim_res, sol.solved)

    nv = st.n + st.M + 2
    nr = st.n_fc + 1 + st.M + st.M * st.K + 1 + st.n
    run = jax.jit(
        lambda: jax.lax.scan(
            one, (jnp.zeros(nv, jnp.float32), jnp.zeros(nr, jnp.float32)),
            jnp.arange(3.0, dtype=jnp.float32),
        )[1]
    )
    iters_out, prims, solveds = run()
    jax.block_until_ready(iters_out)
    ok = bool(jnp.all(solveds)) and bool(jnp.all(jnp.isfinite(prims)))
    print(f"PROBE_{'OK' if ok else 'FAIL'} embedded M={M} TM={TM} "
          f"iters={iters_out.tolist()} prims={prims.tolist()}", flush=True)


if __name__ == "__main__":
    mode, M, TM = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    iters = int(sys.argv[5]) if len(sys.argv) > 5 else 4000
    print(f"[probe] devices: {jax.devices()}", flush=True)
    if mode == "chunk":
        probe_chunk(M, TM, chunk)
    elif mode == "solve":
        probe_solve(M, TM, chunk, iters)
    elif mode == "embedded":
        probe_embedded(M, TM, chunk, iters)
