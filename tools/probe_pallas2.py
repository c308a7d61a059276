"""TPU probe round 2: proper timing (jit reuse) + convergence budget.

    python tools/probe_pallas2.py <M> <TM> <chunk> <max_iter>

Times the fused chunk kernel per-iteration (one compiled function, repeated
calls) and runs the integrated solve at a realistic iteration budget,
comparing the control block against the XLA path at eps 1e-4.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")


def main(M, TM, chunk, max_iter):
    from riskaversetrajopt_tpu.core.config import SolverConfig
    from riskaversetrajopt_tpu.ops import admm as admm_mod
    from riskaversetrajopt_tpu.ops.pallas.experimental import saa_admm as pk
    from riskaversetrajopt_tpu.ops.saa_qp import solve_saa_qp
    from tools.probe_pallas import build_problem

    st, data = build_problem(M)
    cfg = SolverConfig(eps_abs=1e-4, eps_rel=1e-4, max_iter=max_iter)
    d = pk.kernel_dims(st, TM)
    print(f"[probe2] dims {d}", flush=True)

    # --- raw chunk timing: one pallas_call of `chunk` iterations ---
    ops_ = pk.SAAQPOps(st, data, jnp.asarray(3))
    _, q = pk.build_objective(st, data)
    l, u = pk.build_bounds(st, data, jnp.asarray(3))
    scaling = admm_mod.ruiz_equilibrate(ops_, q, l, u, iters=5)
    p, _ = pk.scaled_structure(st, data, jnp.asarray(3), scaling,
                               jnp.float32(0.1), cfg, TM=TM)
    s0 = pk.init_scaled_state(p, d)
    run_chunk = jax.jit(lambda s: pk.admm_chunk_pallas(p, s, d, chunk))
    s1 = run_chunk(s0)
    jax.block_until_ready(s1)
    t0 = time.perf_counter()
    reps = 10
    s = s0
    for _ in range(reps):
        s = run_chunk(s)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / reps / chunk
    print(f"PROBE2 chunk_us_per_iter={dt*1e6:.2f} (M={M} TM={TM} "
          f"chunk={chunk})", flush=True)

    # --- integrated solve, realistic budget ---
    solve_p = jax.jit(
        lambda: pk.solve_saa_qp_pallas(st, data, jnp.asarray(3), cfg,
                                       chunk=chunk, TM=TM)
    )
    sol = solve_p()
    jax.block_until_ready(sol)
    t0 = time.perf_counter()
    sol = solve_p()
    jax.block_until_ready(sol)
    t_p = time.perf_counter() - t0
    print(f"PROBE2 pallas solved={bool(sol.solved)} iters={int(sol.iters)} "
          f"prim={float(sol.prim_res):.2e} dual={float(sol.dual_res):.2e} "
          f"t={t_p:.3f}s", flush=True)

    solve_x = jax.jit(lambda: solve_saa_qp(st, data, jnp.asarray(3), cfg))
    sx = solve_x()
    jax.block_until_ready(sx)
    t0 = time.perf_counter()
    sx = solve_x()
    jax.block_until_ready(sx)
    t_x = time.perf_counter() - t0
    du = float(jnp.max(jnp.abs(sol.x[: st.n] - sx.x[: st.n])))
    print(f"PROBE2 xla solved={bool(sx.solved)} iters={int(sx.iters)} "
          f"t={t_x:.3f}s du={du:.2e}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
         int(sys.argv[4]))
