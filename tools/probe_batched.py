"""Probe: why is the vmapped batched solve slower per-instance than serial?

Compares, at small M on CPU (structure, not absolute perf):
  - serial: B solves in a loop, sum of wall times, per-instance qp_iters
  - vmapped: jit(vmap(solve)) over the same B instances

If the vmapped qp_iters match the serial ones, the overhead is per-iteration
(masked lockstep / both-cond-branches / dynamic-trip fori lowering), not
extra iterations.

Usage: python tools/probe_batched.py [M] [B] [iters]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    opt = bench.make(iters, "admm", 1e-4, 20000)
    omegas = opt.sample(jax.random.PRNGKey(0), M=M)
    oms = [bench._perturb(omegas) for _ in range(B)]
    a = jnp.asarray(0.2, jnp.float32)

    solve1 = jax.jit(lambda om: opt.solve(om, a))
    r = solve1(oms[0])
    np.asarray(r.us)  # compile
    t0 = time.perf_counter()
    serial_iters = []
    for om in oms:
        r = solve1(om)
        np.asarray(r.us)
        serial_iters.append(r.qp_iters.tolist())
    t_serial = time.perf_counter() - t0

    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *oms)
    solve_b = jax.jit(jax.vmap(lambda om: opt.solve(om, a)))
    rb = solve_b(stack)
    np.asarray(rb.us)  # compile
    t0 = time.perf_counter()
    rb = solve_b(jax.tree.map(lambda x: x * (1.0 + 1e-9), stack))
    np.asarray(rb.us)
    t_batch = time.perf_counter() - t0

    print(f"M={M} B={B} serial={t_serial:.3f}s batched={t_batch:.3f}s "
          f"ratio={t_batch/t_serial:.2f}")
    print("serial qp_iters:", serial_iters)
    print("batched qp_iters:", np.asarray(rb.qp_iters).tolist())
    print("batched qp_solved all:", bool(np.asarray(rb.qp_solved).all()))


if __name__ == "__main__":
    main()
