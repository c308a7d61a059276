"""Probe: ADMM over-relaxation (alpha_relax) sweep at the flagship size.

OSQP's default alpha = 1.6; theory allows (0, 2) with faster convergence
toward ~1.8 on many QPs. Iteration count is the only remaining lever at
M=1000 (the iteration is ~40 us HBM + ~40 us small-op latency), so a 10-20%
iteration cut is a direct e2e win.

Usage: python tools/probe_relax.py [alpha ...]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    alphas = [float(a) for a in sys.argv[1:]] or [1.6, 1.7, 1.8, 1.9]
    M = int(os.environ.get("BENCH_M", "1000"))
    iters = int(os.environ.get("BENCH_ITERS", "15"))
    N = int(os.environ.get("PROBE_N", "4"))
    dev = jax.devices()[0]
    for ar in alphas:
        opt = bench.make(iters, "admm", 1e-4, 20000)
        opt.admm_cfg = dataclasses.replace(opt.admm_cfg, alpha_relax=ar)
        omegas = opt.sample(jax.random.PRNGKey(0), M=M)
        om0 = jax.tree.map(lambda x: jax.device_put(x, dev), omegas)
        r = opt.solve(bench._perturb(om0), 0.2)  # compile + warm
        np.asarray(r.us)
        for i in range(N):
            om_i = bench._perturb(om0)
            t0 = time.perf_counter()
            r = opt.solve(om_i, 0.2)
            np.asarray(r.us)
            t = time.perf_counter() - t0
            qi = r.qp_iters.tolist()
            print(
                f"[probe] alpha_relax={ar} inst={i} t={t:.4f}s "
                f"total={sum(qi)} transition={qi[2]} solved="
                f"{int(np.sum(np.asarray(r.qp_solved)))}/{len(qi)} "
                f"l2={float(r.l2_errors[-1]):.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
