"""Probe: G-sweep cost vs storage layout (XLA level, no Pallas).

The traced hot ops read G as f32[1000,60,60]{2,1,0:T(8,128)} — the
minormost dim (n=60) pads to 128 lanes, a 2.13x tile-storage waste. If
the sweeps are BW-bound on the PADDED bytes, a layout whose minor dim
fills lanes (flat-transposed Gt (n, M*K): pads 60->64 sublanes only)
should run ~2x faster. Each form runs inside a fori_loop of ITERS
data-dependent applications to amortize dispatch, mirroring the ADMM
loop's access pattern.

Forms:
  mv_cur   y(m,k) = einsum('mkn,n->mk', G, x)       (current matvec)
  rmv_cur  r(n)   = einsum('mkn,mk->n', G, w)       (current rmatvec)
  mv_flat  y_flat = x @ Gt                          (Gt (n, MK) stored)
  rmv_flat r      = Gt @ w_flat
  pair_cur / pair_flat: both sweeps chained per iteration (the real
  iteration shape: rmatvec feeds the KKT solve feeds matvec)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_default_matmul_precision", "highest")

M, K, N = 1000, 60, 60
ITERS = 1000


def bench_fn(f, *args):
    g = jax.jit(f)
    r = g(*args)
    jax.block_until_ready(r)
    ts = []
    for i in range(3):
        a2 = [a * (1.0 + (i + 1) * 1e-7) for a in args]
        t0 = time.perf_counter()
        r = g(*a2)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return 1e6 * ts[1] / ITERS


def main():
    key = jax.random.PRNGKey(0)
    G = jax.random.normal(key, (M, K, N), jnp.float32)
    Gt = jnp.asarray(np.transpose(np.asarray(G), (2, 0, 1)).reshape(N, M * K))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (N,), jnp.float32)
    w0 = jax.random.normal(jax.random.PRNGKey(2), (M, K), jnp.float32)

    def mv_cur(G, x0):
        def body(i, x):
            y = jnp.einsum("mkn,n->mk", G, x,
                           precision=lax.Precision.HIGHEST)
            return x + y[0, :N] * 1e-9
        return lax.fori_loop(0, ITERS, body, x0)

    def rmv_cur(G, w0):
        def body(i, w):
            r = jnp.einsum("mkn,mk->n", G, w,
                           precision=lax.Precision.HIGHEST)
            return w + r[None, :K] * 1e-9
        return lax.fori_loop(0, ITERS, body, w0)

    def mv_flat(Gt, x0):
        def body(i, x):
            y = x @ Gt  # (MK,)
            return x + y[:N] * 1e-9
        return lax.fori_loop(0, ITERS, body, x0)

    def rmv_flat(Gt, w0):
        w0 = w0.reshape(-1)
        def body(i, w):
            r = Gt @ w  # (N,)
            return w + jnp.tile(r, (M * K) // N) * 1e-9
        return lax.fori_loop(0, ITERS, body, w0)

    def pair_cur(G, x0):
        def body(i, x):
            w = jnp.einsum("mkn,n->mk", G, x,
                           precision=lax.Precision.HIGHEST)
            r = jnp.einsum("mkn,mk->n", G, w,
                           precision=lax.Precision.HIGHEST)
            return x + r * 1e-9
        return lax.fori_loop(0, ITERS, body, x0)

    def pair_flat(Gt, x0):
        def body(i, x):
            w = x @ Gt
            r = Gt @ w
            return x + r * 1e-9
        return lax.fori_loop(0, ITERS, body, x0)

    for name, f, args in [
        ("mv_cur", mv_cur, (G, x0)),
        ("rmv_cur", rmv_cur, (G, w0)),
        ("mv_flat", mv_flat, (Gt, x0)),
        ("rmv_flat", rmv_flat, (Gt, w0)),
        ("pair_cur", pair_cur, (G, x0)),
        ("pair_flat", pair_flat, (Gt, x0)),
    ]:
        us = bench_fn(f, *args)
        print(f"[probe] {name:<10} {us:7.2f} us/iter", flush=True)


if __name__ == "__main__":
    main()
