"""Probe: does the ds (double-single) ADMM backend track the x64 branch?

CPU, drone M=50 (and optionally M=1000 via DS_PROBE_M): solve the same SCP
instance with (a) the x64 'admm' golden-class path, (b) f32 'admm-ds',
(c) f32 'admm-ir' parity config for context. Reports pairwise relative L2
of the final controls and per-QP iteration counts.

Usage: python tools/probe_ds.py  [env: DS_PROBE_M, DS_PROBE_PASSES]
"""

import os
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from riskaversetrajopt_tpu.core.config import (
    DroneScenario, SCPConfig, SolverConfig,
)
from riskaversetrajopt_tpu.models.drone import DroneModel
from riskaversetrajopt_tpu.scp.driver import SAATrajOpt

M = int(os.environ.get("DS_PROBE_M", "50"))
passes = int(os.environ.get("DS_PROBE_PASSES", "1"))
alpha = 0.2
scp_cfg = SCPConfig(num_iters=15, gate_iters=2, gate_row_scale=1e-7,
                    gate_bound_l=-0.1, gate_bound_u=0.1)
model = DroneModel(DroneScenario(M=M))
om = model.sample(jax.random.PRNGKey(0), M=M)


def run(backend, dtype, **kw):
    cfg = SolverConfig(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000,
                       polish=False, kkt_refine_iters=1,
                       ds_kkt_passes=passes)
    opt = SAATrajOpt(model, method="saa", scp_cfg=scp_cfg,
                     qp_backend=backend, admm_cfg=cfg, dtype=dtype, **kw)
    t0 = time.time()
    res = opt.solve(om, alpha=alpha)
    us = np.asarray(res.us)
    t = time.time() - t0
    print(f"[{backend}/{np.dtype(dtype).name}] t={t:.1f}s "
          f"qp_iters={res.qp_iters.tolist()} solved={res.qp_solved.tolist()}")
    return us


us64 = run("admm", jnp.float64)
usds = run("admm-ds", jnp.float32)


def l2(a, b):
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


print(f"l2(ds_f32, admm_x64) = {l2(usds, us64):.3e}")

if os.environ.get("DS_PROBE_IR", "0") == "1":
    from riskaversetrajopt_tpu.ops.qp_refine import IRConfig

    cfg = SolverConfig(eps_abs=1e-4, eps_rel=1e-5, max_iter=20000,
                       polish=False, kkt_refine_iters=1)
    opt = SAATrajOpt(model, method="saa", scp_cfg=scp_cfg,
                     qp_backend="admm-ir", admm_cfg=cfg, dtype=jnp.float32,
                     ir_cfg=IRConfig(base_eps_abs=1e-4, base_eps_rel=1e-5,
                                     base_max_iter=20000))
    res = opt.solve(om, alpha=alpha)
    usir = np.asarray(res.us)
    print(f"l2(ir_f32, admm_x64) = {l2(usir, us64):.3e}")
