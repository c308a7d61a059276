"""Bisect: which part of the full SCP driver faults the chip with the
fused Pallas ADMM backend at M=1000?

Round-2 probes (tools/probe_pallas.py) pass standalone and embedded-in-scan
at M=1000 with vmem_limit_bytes=100MB, but the REAL driver program
(lax.scan over [linearize + pack + solve_saa_qp_pallas + polish] with
traced scp_iter gating and bench knobs) crashed the TPU worker on first
execution (round 3). One case per process — a fault wedges the chip for
minutes; tools/bisect_pallas_driver.sh drives the ladder with recovery
sleeps.

Usage: python tools/bisect_pallas_driver.py <case> [M]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def make_opt(num_iters, M, polish=True, max_iter=20000, adaptive=True,
             backend="_admm-pallas"):
    from riskaversetrajopt_tpu.core.config import (
        DroneScenario, SCPConfig, SolverConfig)
    from riskaversetrajopt_tpu.models.drone import DroneModel
    from riskaversetrajopt_tpu.scp.driver import SAATrajOpt

    model = DroneModel(DroneScenario())
    return SAATrajOpt(
        model,
        method="saa",
        scp_cfg=SCPConfig(
            num_iters=num_iters, gate_iters=2, gate_row_scale=1e-7,
            gate_bound_l=-0.1, gate_bound_u=0.1,
        ),
        qp_backend=backend,
        admm_cfg=SolverConfig(
            eps_abs=1e-4, eps_rel=1e-4, max_iter=max_iter,
            polish=polish, adaptive_rho=adaptive, kkt_refine_iters=1,
        ),
        dtype=jnp.float32,
    )


def run_driver(case, M, **kw):
    opt = make_opt(kw.pop("num_iters"), M, **kw)
    omegas = opt.sample(jax.random.PRNGKey(0), M=M)
    a = jnp.asarray(0.2, jnp.float32)
    t0 = time.perf_counter()
    res = opt.solve(omegas, a)
    us = np.asarray(res.us)
    dt = time.perf_counter() - t0
    ok = bool(np.isfinite(us).all())
    print(f"BISECT_{'OK' if ok else 'FAIL'} {case} M={M} t={dt:.1f}s "
          f"qp_iters={res.qp_iters.tolist()} "
          f"solved={res.qp_solved.tolist()} "
          f"l2={float(res.l2_errors[-1]):.2e}", flush=True)


CASES = {
    # ladder: driver depth first, then knobs on the failing depth
    "drv1": dict(num_iters=1),
    "drv3": dict(num_iters=3),
    "drv15": dict(num_iters=15),
    "drv3_np": dict(num_iters=3, polish=False),
    "drv3_mi4k": dict(num_iters=3, max_iter=4000),
    "drv3_noad": dict(num_iters=3, adaptive=False),
    "drv1_np_mi4k_noad": dict(num_iters=1, polish=False, max_iter=4000,
                              adaptive=False),
    "drv15_np_mi4k_noad": dict(num_iters=15, polish=False, max_iter=4000,
                               adaptive=False),
    "drv15_mi4k_noad": dict(num_iters=15, max_iter=4000, adaptive=False),
    "drv15_noad": dict(num_iters=15, adaptive=False),
    "drv15_mi4k": dict(num_iters=15, max_iter=4000),
    "xla3": dict(num_iters=3, backend="admm"),  # control
}


def main():
    case = sys.argv[1]
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    print(f"[bisect] devices: {jax.devices()} case={case}", flush=True)
    run_driver(case, M, **CASES[case])


if __name__ == "__main__":
    main()
