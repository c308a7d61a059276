"""TPU probe: isolate the batched-solve (vmap) slowdown by config matrix.

BENCH_r02 measured the batched leg at ~4.4 s/solve (B=4, M=1000) vs 0.695 s
serial, while tools/probe_batched_tpu.py showed FIXED-COUNT ADMM iterations
amortize well under vmap (59 us/inst-iter at B=4 vs 124 us at B=1, eps=0,
adaptive_rho=False, polish=False). The gap must come from the pieces that
probe excluded: the adaptive-rho two-level while loop, the termination
checks with backoff, polish, or the SCP scan wrapper. This probe times ONE
full QP solve (same subproblem, B perturbed copies) across a config matrix:

  base      adaptive_rho=False polish=False (the fast fixed-count shape,
            but with real eps termination)
  arho      + adaptive_rho=True  (two-level while under vmap)
  polish    + polish=True        (lax.cond accept-if-better under vmap)
  full      adaptive_rho=True polish=True (production config)

Prints PROBE_B3 lines with per-config {B, t, qp_iters per element}.

Usage: python tools/probe_batched3.py [M] [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from riskaversetrajopt_tpu.core.config import SolverConfig
    from riskaversetrajopt_tpu.ops.saa_qp import solve_saa_qp
    from tools.probe_pallas import build_problem

    st, data = build_problem(M)

    configs = {
        "base": SolverConfig(
            eps_abs=1e-4, eps_rel=1e-4, max_iter=20000,
            adaptive_rho=False, polish=False,
        ),
        "arho": SolverConfig(
            eps_abs=1e-4, eps_rel=1e-4, max_iter=20000,
            adaptive_rho=True, polish=False,
        ),
        "polish": SolverConfig(
            eps_abs=1e-4, eps_rel=1e-4, max_iter=20000,
            adaptive_rho=False, polish=True,
        ),
        "full": SolverConfig(
            eps_abs=1e-4, eps_rel=1e-4, max_iter=20000,
            adaptive_rho=True, polish=True,
        ),
    }

    for name, cfg in configs.items():
        def solve_one(g_up):
            s = solve_saa_qp(st, data._replace(g_up=g_up), jnp.asarray(3), cfg)
            return s.x, s.iters

        gs = jnp.stack([data.g_up * (1.0 + 1e-7 * (i + 1)) for i in range(B)])
        fn = jax.jit(jax.vmap(solve_one))
        f1 = jax.jit(lambda gb: solve_one(gb[0]))

        x, it = fn(gs)
        np.asarray(x)
        t0 = time.perf_counter()
        x, it = fn(gs * (1.0 + 3e-8))
        np.asarray(x)
        tb = time.perf_counter() - t0

        x1, it1 = f1(gs)
        np.asarray(x1)
        t0 = time.perf_counter()
        x1, it1 = f1(gs * (1.0 + 3e-8))
        np.asarray(x1)
        t1 = time.perf_counter() - t0

        print(
            f"PROBE_B3 {{'cfg': '{name}', 'B': {B}, 't_batch': {tb:.4f}, "
            f"'t_single': {t1:.4f}, 'ratio': {tb / t1:.2f}, "
            f"'iters_b': {np.asarray(it).tolist()}, "
            f"'iters_1': {int(np.asarray(it1))}}}",
            flush=True,
        )


if __name__ == "__main__":
    main()
