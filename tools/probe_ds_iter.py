"""Decompose the ds-ADMM per-iteration cost (TPU), fixed-budget method of
tools/probe_iter_cost.py: unreachable tolerance + fixed max_iter so t/N is
the clean per-iteration cost.

Variants: default | passes0 (ds_kkt_passes=0) | check100 | noadapt.
Env: DS_M (1000), DS_BUDGET (2000).
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
from riskaversetrajopt_tpu.ops.admm_ds import solve_saa_qp_ds  # noqa: E402
from riskaversetrajopt_tpu.ops.saa_qp import (  # noqa: E402
    SAAQPStatic,
    pack_saa_qp_data,
)

BASE = dict(
    eps_abs=1e-12, eps_rel=1e-12, check_every=25,
    polish=False, kkt_refine_iters=1, rho_update_factor=1.5,
)
VARIANTS = {
    "default": {},
    "passes0": {"ds_kkt_passes": 0},
    "check100": {"check_every": 100},
    "noadapt": {"adaptive_rho": False},
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    M = int(os.environ.get("DS_M", "1000"))
    budget = int(os.environ.get("DS_BUDGET", "2000"))
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
        cfg = SolverConfig(**{**BASE, **VARIANTS[name]}, max_iter=budget)
        f = jax.jit(
            lambda d, cfg=cfg: solve_saa_qp_ds(
                st, d, jnp.asarray(3), cfg,
                ds_kkt_passes=getattr(cfg, "ds_kkt_passes", 1),
            )
        )
        r = f(data)  # compile + warm
        np.asarray(r.x)
        times = []
        for i in range(3):
            d_i = jax.tree.map(lambda a: a * (1.0 + (i + 1) * 1e-7), data)
            t0 = time.perf_counter()
            r = f(d_i)
            np.asarray(r.x)
            times.append(time.perf_counter() - t0)
        times.sort()
        t = times[len(times) // 2]
        n_it = int(r.iters)
        print(
            f"[probe_ds_iter] M={M} {name:<9} t={t:.4f}s iters={n_it} "
            f"us_per_iter={1e6 * t / max(n_it, 1):.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
