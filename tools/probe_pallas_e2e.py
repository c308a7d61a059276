"""TPU probe: full SCP solve with the fused Pallas ADMM backend.

Times the admm-pallas backend end-to-end at the bench configuration
(M=1000, 15 SCP iterations, eps 1e-4) on the real chip and reports the same
honesty metrics as bench.py (qp_iters, certification, golden distance), so
the fused backend can be A/B'd against the XLA 'admm' path (BENCH_r02:
0.695 s/solve).

Usage: python tools/probe_pallas_e2e.py [backend] [M] [repeats]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (pins matmul precision)


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "_admm-pallas"
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    print(f"[probe-e2e] devices={jax.devices()} backend={backend} M={M}",
          flush=True)
    opt = bench.make(15, backend, 1e-4, 20000)
    omegas = opt.sample(jax.random.PRNGKey(0), M=M)
    alpha = 0.2
    accel = jax.devices()[0]
    t0 = time.perf_counter()
    t, res = bench.time_solve(opt, omegas, alpha, accel, repeats)
    print(f"[probe-e2e] total wall (incl compile) {time.perf_counter()-t0:.1f}s",
          flush=True)
    qp_iters = res.qp_iters.tolist()
    qp_solved = res.qp_solved.tolist()
    out = {
        "backend": backend,
        "t_solve": round(t, 4),
        "solves_per_s": round(1.0 / t, 4),
        "qp_iters": qp_iters,
        "qp_solved": qp_solved,
        "capped": len([i for i in qp_iters if i >= 20000]),
        "l2_final": float(res.l2_errors[-1]),
    }
    gold_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", f"gold_drone_m{M}_a{alpha}_seed0_iters15.npy")
    if os.path.exists(gold_path):
        gold = np.load(gold_path)
        us = np.asarray(res.us)
        out["l2_vs_golden"] = float(
            np.linalg.norm(us - gold) / np.linalg.norm(gold))
        mc_om = opt.sample(jax.random.PRNGKey(99), M=3000)
        mc = opt.monte_carlo(res.us, mc_om, alpha)
        out["mc"] = {k: round(float(mc[k]), 4)
                     for k in ("safe_frac", "avar", "cost")}
    print("PROBE_E2E", out, flush=True)


if __name__ == "__main__":
    main()
