"""Isolate which ds kernel faults on the chip at large M.

Runs each compensated building block standalone at DS_OP_M samples inside
a fori loop, materializing results. Select with DS_OP in
{matvec, rmatvec, sum0, sum2, elementwise, kkt}.
"""

import os
import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np
from jax import lax

from riskaversetrajopt_tpu.core.config import DroneScenario, SCPConfig
from riskaversetrajopt_tpu.models.drone import DroneModel
from riskaversetrajopt_tpu.ops import dsjit as ds
from riskaversetrajopt_tpu.ops.qp_refine import _ds_matvec_A, _ds_rmatvec_A
from riskaversetrajopt_tpu.ops.saa_qp import SAAQPOps, SAAQPStatic

M = int(os.environ.get("DS_OP_M", "1000"))
which = os.environ.get("DS_OP", "matvec")
iters = int(os.environ.get("DS_OP_ITERS", "50"))
print(f"[probe_ds_ops] device={jax.devices()[0]} M={M} op={which}",
      flush=True)

model = DroneModel(DroneScenario(M=M))
om = model.sample(jax.random.PRNGKey(0), M=M)
us0 = model.initial_guess().astype(jnp.float32)
from riskaversetrajopt_tpu.scp.driver import SAATrajOpt

opt = SAATrajOpt(model, method="saa", dtype=jnp.float32)
st = opt._static_for(M)
om32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), om)
mb = model.bind(jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                             model.consts()))
data = opt._define(us0, om32, jnp.asarray(0.2, jnp.float32), M, model=mb,
                   p_diag_u=jnp.asarray(opt.p_diag_u, jnp.float32))
ops = SAAQPOps(st, data, jnp.asarray(5))
n = st.n + st.M + 2
m_rows = st.n_fc + 1 + st.M + st.M * st.K + 1 + st.n
key = jax.random.PRNGKey(1)
x = jax.random.normal(key, (n,), jnp.float32)
w = jax.random.normal(key, (m_rows,), jnp.float32)
G = data.G


@jax.jit
def run_matvec(x):
    def body(i, acc):
        h, lo = _ds_matvec_A(ops, acc, jnp.zeros_like(acc))
        return acc + 1e-9 * h[: acc.shape[0]]

    return lax.fori_loop(0, iters, body, x)


@jax.jit
def run_rmatvec(w):
    def body(i, acc):
        h, lo = _ds_rmatvec_A(ops, acc)
        return acc + 1e-9 * jnp.concatenate(
            [h, jnp.zeros(acc.shape[0] - h.shape[0], h.dtype)]
        )

    return lax.fori_loop(0, iters, body, w)


@jax.jit
def run_sum0(G):
    def body(i, acc):
        h, lo = ds.sum1_ds(G * (1.0 + 1e-9 * acc), axis=0)
        return acc + 1e-12 * jnp.mean(h)

    return lax.fori_loop(0, iters, body, jnp.float32(0.0))


@jax.jit
def run_sum2(G):
    def body(i, acc):
        h, lo = ds.sum1_ds(G * (1.0 + 1e-9 * acc), axis=2)
        return acc + 1e-12 * jnp.mean(h)

    return lax.fori_loop(0, iters, body, jnp.float32(0.0))


@jax.jit
def run_elementwise(G):
    def body(i, acc):
        p, e = ds.two_prod(G, G * (1.0 + 1e-9 * acc))
        return acc + 1e-12 * (jnp.mean(p) + jnp.mean(e))

    return lax.fori_loop(0, iters, body, jnp.float32(0.0))


@jax.jit
def run_kkt(x):
    sigma = jnp.full(n, 1e-6, jnp.float32)
    rv = jnp.full(m_rows, 0.1, jnp.float32)
    factor = ops.factorize(rv, sigma)

    def body(i, acc):
        out = ops.kkt_solve(factor, acc, rv, sigma)
        return acc + 1e-9 * out

    return lax.fori_loop(0, iters, body, x)


fn = {"matvec": (run_matvec, x), "rmatvec": (run_rmatvec, w),
      "sum0": (run_sum0, G), "sum2": (run_sum2, G),
      "elementwise": (run_elementwise, G), "kkt": (run_kkt, x)}[which]
t0 = time.time()
out = fn[0](fn[1])
np.asarray(out)
dt = time.time() - t0
print(f"[probe_ds_ops] {which} OK compile+run {dt:.1f}s "
      f"({dt/iters*1e6:.0f} us/iter incl compile)", flush=True)
t0 = time.time()
out = fn[0](fn[1])
np.asarray(out)
dt = time.time() - t0
print(f"[probe_ds_ops] {which} warm {dt:.3f}s ({dt/iters*1e6:.0f} us/iter)",
      flush=True)
