"""Decompose the current ADMM per-iteration cost at M=1000 (TPU).

Runs solve_saa_qp on the flagship-size ungated QP with an unreachable
tolerance and a FIXED iteration budget, so t/N is the clean per-iteration
cost of the production loop (rho adaptation and termination checks
included). Variants toggle one knob each:

  default      factored refine + compensated formation + S^-1 apply
  no_refine    kkt_refine_iters=0 (isolates the refinement pass cost)
  trsm         kkt_chol_inverse=False (isolates the triangular solves)
  check100     check_every=100 (isolates the termination-check cost)
  sweep_high   bf16x3 G-sweeps (isolates MXU feed precision cost)

Usage: python tools/probe_iter_cost.py [variant ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

from riskaversetrajopt_tpu.core.config import (  # noqa: E402
    DroneScenario,
    SolverConfig,
)
from riskaversetrajopt_tpu.models.drone import DroneModel  # noqa: E402
from riskaversetrajopt_tpu.ops.rollout import linearize_batch  # noqa: E402
from riskaversetrajopt_tpu.ops.saa_qp import (  # noqa: E402
    SAAQPStatic,
    pack_saa_qp_data,
    solve_saa_qp,
)

BASE = dict(
    eps_abs=1e-12, eps_rel=1e-12, max_iter=2000, check_every=25,
    polish=False, kkt_refine_iters=1, kkt_refine_mode="factored",
    kkt_chol_inverse=True, rho_update_factor=1.5,
)
VARIANTS = {
    "default": {},
    "no_refine": {"kkt_refine_iters": 0},
    "trsm": {"kkt_chol_inverse": False},
    "check100": {"check_every": 100},
    "sweep_high": {"sweep_precision": "high"},
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    M = int(os.environ.get("BENCH_M", "1000"))
    model = DroneModel(DroneScenario())
    omegas = model.sample(jax.random.PRNGKey(0), M=M, method="saa")
    us = model.initial_guess().astype(jnp.float32)
    lin = linearize_batch(
        model.bind(jax.tree.map(jnp.asarray, model.consts())), us, omegas
    )
    p_diag_u = jnp.tile(
        2.0 * model.dt * jnp.diag(model.scn.R), model.S
    ).astype(jnp.float32)
    data = pack_saa_qp_data(lin, us.reshape(-1), p_diag_u, 0.2)
    data = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), data)
    st = SAAQPStatic(
        n=model.S * model.n_u, M=M, K=model.K, n_fc=model.n_fc,
        n_x=model.n_x, row_scale=model.row_scale,
        slack_penalty=model.slack_penalty, u_max=float(model.scn.u_max),
        baseline=False, baseline_pad=1e-3, gate_iters=2, gate_scale=1e-7,
        gate_l=-0.1, gate_u=0.1,
    )

    for name in names:
        cfg = SolverConfig(**{**BASE, **VARIANTS[name]})
        f = jax.jit(
            lambda d, cfg=cfg: solve_saa_qp(st, d, jnp.asarray(3), cfg)
        )
        r = f(data)  # compile + warm
        np.asarray(r.x)
        times = []
        for i in range(3):
            d_i = jax.tree.map(
                lambda a: a * (1.0 + (i + 1) * 1e-7), data
            )  # never-seen (result cache)
            t0 = time.perf_counter()
            r = f(d_i)
            np.asarray(r.x)
            times.append(time.perf_counter() - t0)
        times.sort()
        t = times[len(times) // 2]
        n_it = int(r.iters)
        print(
            f"[probe] {name:<11} t={t:.4f}s iters={n_it} "
            f"us_per_iter={1e6 * t / max(n_it, 1):.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
