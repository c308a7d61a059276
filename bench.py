"""Benchmark: drone_risk SAA SCP at M=1000 samples, full horizon, on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

metric: full SCP solves per second (one solve = 15 SCP iterations of
linearize + CVaR-pack + QP solve at M=1000, the BASELINE.md north-star
configuration; the reference runs the same loop as JAX-CPU-x64 define + OSQP
solve per iteration, car/driving.py:486-513).

vs_baseline: speedup of the TPU run over the SAME jitted computation executed
on this host's CPU backend (f32). This is a conservative stand-in for the
reference CPU harness — the reference's per-iteration host<->OSQP round trip
and scipy.sparse rebuild of a ~61k-row matrix at M=1000 is strictly slower
than our fused CPU path, so the true speedup vs the reference is higher.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# TPU f32 matmuls default to bf16 MXU passes; the trajectory-optimization
# kernels are accuracy-sensitive (the ADMM convergence rate tracks KKT solve
# precision), so pin full-f32 arithmetic
jax.config.update("jax_default_matmul_precision", "highest")


def make(num_iters):
    from riskaversetrajopt_tpu.core.config import (
        DroneScenario,
        SCPConfig,
        SolverConfig,
    )
    from riskaversetrajopt_tpu.models.drone import DroneModel
    from riskaversetrajopt_tpu.scp.driver import SAATrajOpt

    model = DroneModel(DroneScenario())
    return SAATrajOpt(
        model,
        method="saa",
        scp_cfg=SCPConfig(
            num_iters=num_iters,
            gate_iters=2,
            gate_row_scale=1e-7,
            gate_bound_l=-0.1,
            gate_bound_u=0.1,
        ),
        qp_backend="admm",
        admm_cfg=SolverConfig(eps_abs=1e-4, eps_rel=1e-4, max_iter=2000),
        dtype=jnp.float32,
    )


def time_solve(opt, omegas, alpha, device, repeats):
    with jax.default_device(device):
        om = jax.tree.map(lambda x: jax.device_put(x, device), omegas)
        a = jax.device_put(jnp.asarray(alpha, jnp.float32), device)
        # warm-up / compile
        res = opt.solve(om, a)
        res.us.block_until_ready()
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            res = opt.solve(om, a)
            res.us.block_until_ready()
            times.append(time.perf_counter() - t0)
    return min(times), res


def main():
    M = int(os.environ.get("BENCH_M", "1000"))
    iters = int(os.environ.get("BENCH_ITERS", "15"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    opt = make(iters)
    omegas = opt.sample(jax.random.PRNGKey(0), M=M)

    accel = jax.devices()[0]
    t_accel, res = time_solve(opt, omegas, 0.1, accel, repeats)
    l2_final = float(res.l2_errors[-1])
    print(
        f"[bench] device={accel} M={M} iters={iters} t={t_accel:.4f}s "
        f"l2_final={l2_final:.2e} qp_iters={res.qp_iters.tolist()}",
        file=sys.stderr,
    )

    cpu = jax.devices("cpu")[0]
    t_cpu, _ = time_solve(opt, omegas, 0.1, cpu, 1)
    print(f"[bench] cpu baseline t={t_cpu:.4f}s", file=sys.stderr)

    solves_per_s = 1.0 / t_accel
    print(
        json.dumps(
            {
                "metric": f"drone_risk SCP solves/s (M={M}, {iters} iters, 1 chip)",
                "value": round(solves_per_s, 4),
                "unit": "solves/s",
                "vs_baseline": round(t_cpu / t_accel, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
