"""TPU probe: per-ADMM-iteration cost under vmap (batched-problem axis).

BENCH_r02's batched_throughput leg measured B=4 lockstep M=1000 solves at
~4.4 s per solve vs 0.695 s serial — a 6x per-solve regression where the
batched axis was supposed to amortize latency. CPU probing
(tools/probe_batched.py) shows iteration counts are comparable, so the
regression is per-iteration cost under vmap on the TPU. This probe times a
FIXED-COUNT ADMM run (eps=0, adaptive off, polish off, max_iter=N) at
B in {1,2,4} and reports us/iteration, isolating the while-loop body cost
from termination/convergence effects.

Usage: python tools/probe_batched_tpu.py [M] [N_iters]
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
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    from riskaversetrajopt_tpu.core.config import SolverConfig
    from riskaversetrajopt_tpu.ops.saa_qp import solve_saa_qp
    from tools.probe_pallas import build_problem

    st, data = build_problem(M)
    cfg = SolverConfig(
        eps_abs=0.0, eps_rel=0.0, max_iter=N, check_every=25,
        adaptive_rho=False, polish=False, kkt_refine_iters=1,
    )

    def solve_one(g_up):
        return solve_saa_qp(st, data._replace(g_up=g_up), jnp.asarray(3), cfg).x

    for B in (1, 2, 4):
        g = jnp.stack([data.g_up * (1.0 + 1e-7 * i) for i in range(B)])
        if B == 1:
            fn = jax.jit(lambda gb: solve_one(gb[0]))
        else:
            fn = jax.jit(jax.vmap(solve_one))
        x = fn(g)
        np.asarray(x)  # compile + warm
        times = []
        for r in range(3):
            gp = g * (1.0 + 1e-9 * (r + 1))
            t0 = time.perf_counter()
            x = fn(gp)
            np.asarray(x)
            times.append(time.perf_counter() - t0)
        t = sorted(times)[1]
        print(f"PROBE_BATCH B={B} t={t:.4f}s us_per_iter_per_inst="
              f"{t / N * 1e6:.1f} us_per_iter_total={t / N / B * 1e6:.1f}",
              flush=True)


if __name__ == "__main__":
    main()
