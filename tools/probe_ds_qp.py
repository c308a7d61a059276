"""Single-QP ds-ADMM fault isolation at large M.

Runs ONE bounded solve_saa_qp_ds at DS_QP_M samples (cold start,
max_iter=DS_QP_MAXIT) on the chip. DS_QP_PASSES sets ds_kkt_passes.
"""

import os
import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from riskaversetrajopt_tpu.core.config import DroneScenario, SolverConfig
from riskaversetrajopt_tpu.models.drone import DroneModel
from riskaversetrajopt_tpu.ops.admm_ds import solve_saa_qp_ds
from riskaversetrajopt_tpu.scp.driver import SAATrajOpt

M = int(os.environ.get("DS_QP_M", "1000"))
maxit = int(os.environ.get("DS_QP_MAXIT", "200"))
passes = int(os.environ.get("DS_QP_PASSES", "1"))
adaptive = bool(int(os.environ.get("DS_QP_ADAPTIVE", "1")))
print(f"[probe_ds_qp] device={jax.devices()[0]} M={M} maxit={maxit} "
      f"passes={passes} adaptive={adaptive}", flush=True)

model = DroneModel(DroneScenario(M=M))
om = model.sample(jax.random.PRNGKey(0), M=M)
opt = SAATrajOpt(model, method="saa", dtype=jnp.float32)
om32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), om)
mb = model.bind(jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                             model.consts()))
us0 = model.initial_guess().astype(jnp.float32)
data = opt._define(us0, om32, jnp.asarray(0.2, jnp.float32), M, model=mb,
                   p_diag_u=jnp.asarray(opt.p_diag_u, jnp.float32))
st = opt._static_for(M)
cfg = SolverConfig(eps_abs=1e-5, eps_rel=1e-5, max_iter=maxit, polish=False,
                   kkt_refine_iters=1, adaptive_rho=adaptive,
                   ds_kkt_passes=passes)

fn = jax.jit(lambda d: solve_saa_qp_ds(st, d, jnp.asarray(5), cfg,
                                       ds_kkt_passes=passes))
t0 = time.time()
sol = fn(data)
np.asarray(sol.x)
print(f"[probe_ds_qp] OK compile+run {time.time()-t0:.1f}s "
      f"iters={int(sol.iters)} prim={float(sol.prim_res):.2e} "
      f"dual={float(sol.dual_res):.2e}", flush=True)
t0 = time.time()
sol = fn(jax.tree.map(lambda x: x * (1.0 + 1e-7), data))
np.asarray(sol.x)
print(f"[probe_ds_qp] warm {time.time()-t0:.2f}s iters={int(sol.iters)}",
      flush=True)
