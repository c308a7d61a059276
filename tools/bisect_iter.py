"""Bisect the per-ADMM-iteration cost gap inside admm_solve at M=1000.

profile_scp.py measures a pure scan of one_iter at ~16 us/iteration, yet the
full solve's effective rate is ~10x that (full SCP 1283 ms for ~5.7k
iterations; the cold 20000-iteration QP runs at ~236 us/iter). This tool
times structural variants between the two endpoints on fixed data, each
forced to execute exactly T total iterations, to find where the time goes:

  scan_fixed        static lax.scan of one_iter, fixed rho vector (baseline)
  scan_rv           + rho_vector recomputed every iteration
  chunks_static     outer scan over T/25 chunks, inner static fori_loop(25)
  chunks_while      lax.while_loop outer, DYNAMIC interval from carry
  chunks_while_chk  + full residual/eps computation per chunk
  admm_noada        real admm_solve, adaptive_rho=False, polish=False, eps=0
  admm_ada          real admm_solve, adaptive_rho=True,  polish=False, eps=0
  admm_full         real admm_solve, defaults (polish on), eps=0

Timing: median of 3 runs; inputs perturbed per run (the runtime result-caches
identical executions). Run detached on TPU:
  setsid nohup python -u tools/bisect_iter.py > /tmp/bisect.log 2>&1 &
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_default_matmul_precision", "highest")

from riskaversetrajopt_tpu.ops import admm
from riskaversetrajopt_tpu.ops.saa_qp import (
    SAAQPOps,
    build_bounds,
    build_objective,
    pack_saa_qp_data,
)
from riskaversetrajopt_tpu.ops.rollout import linearize_batch
from tools.profile_scp import make_opt

M = int(os.environ.get("BIS_M", "1000"))
T = int(os.environ.get("BIS_T", "2000"))  # total ADMM iterations per variant
CHUNK = 25


def timed3(fn, mkargs):
    ts = []
    for i in range(4):
        args = mkargs(i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts[1:])  # drop first (possible compile/cache residue)
    return ts[len(ts) // 2]


def main():
    opt = make_opt()
    model = opt.model
    st = opt._static_for(M)
    mc = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), model.consts())
    pdu = opt.p_diag_u.astype(jnp.float32)
    omegas = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        opt.sample(jax.random.PRNGKey(0), M=M),
    )
    alpha = jnp.asarray(0.2, jnp.float32)
    us0 = model.initial_guess().astype(jnp.float32)
    cfg = opt.admm_cfg
    it5 = jnp.asarray(5)

    @jax.jit
    def define_once(us, om, a):
        m = model.bind(mc)
        lin = linearize_batch(m, us, om)
        return pack_saa_qp_data(lin, us.reshape(-1), pdu, a)

    data0 = jax.block_until_ready(define_once(us0, omegas, alpha))

    def mkops(data):
        return SAAQPOps(st, data, it5, kkt_refine_iters=cfg.kkt_refine_iters)

    def qlu(data):
        _, q = build_objective(st, data)
        l, u = build_bounds(st, data, it5)
        return q, l, u

    def perturb(data, i):
        f = 1.0 + 1e-7 * (i + 1)
        return data._replace(G=data.G * f, g_up=data.g_up * f)

    q0, l0, u0 = qlu(data0)
    scaling0 = jax.jit(
        lambda d: admm.ruiz_equilibrate(mkops(d), *qlu(d), iters=5)
    )(data0)
    jax.block_until_ready(scaling0)
    nv = st.n + st.M + 2
    sigma_vec = jnp.full(nv, cfg.sigma, jnp.float32)
    alpha_r = jnp.asarray(cfg.alpha_relax, jnp.float32)
    rho0 = jnp.asarray(cfg.rho, jnp.float32)

    def report(name, t):
        print(f"{name:18s} {t*1e3:9.2f} ms total  {t/T*1e6:8.2f} us/iter",
              flush=True)

    # Shared pieces, all closed over data passed as args -----------------
    def prep(data):
        q, l, u = qlu(data)
        sops = admm.ScaledOps(mkops(data), scaling0)
        qs = scaling0.c * scaling0.D * q
        ls = scaling0.E * l
        us_b = scaling0.E * u
        rv = admm.rho_vector(ls, us_b, rho0)
        factor = sops.factorize(rv, sigma_vec)
        x = jnp.zeros(nv, jnp.float32)
        z = jnp.zeros(ls.shape[0], jnp.float32)
        y = jnp.zeros(ls.shape[0], jnp.float32)
        return sops, qs, ls, us_b, rv, factor, x, z, y

    def one_iter(sops, qs, ls, us_b, rv, factor, x, z, y):
        rhs = sigma_vec * x - qs + sops.rmatvec_A(rv * z - y)
        xt = sops.kkt_solve(factor, rhs, rv, sigma_vec)
        zt = sops.matvec_A(xt)
        x_n = alpha_r * xt + (1 - alpha_r) * x
        z_r = alpha_r * zt + (1 - alpha_r) * z
        z_n = jnp.clip(z_r + y / rv, ls, us_b)
        y_n = y + rv * (z_r - z_n)
        return x_n, z_n, y_n

    # 1. static scan, fixed rv -------------------------------------------
    @jax.jit
    def scan_fixed(data):
        sops, qs, ls, us_b, rv, factor, x, z, y = prep(data)

        def body(c, _):
            x, z, y = c
            return one_iter(sops, qs, ls, us_b, rv, factor, x, z, y), ()

        (x, z, y), _ = lax.scan(body, (x, z, y), None, length=T)
        return x

    report("scan_fixed", timed3(scan_fixed, lambda i: (perturb(data0, i),)))

    # 2. static scan, rho_vector recomputed every iteration ---------------
    @jax.jit
    def scan_rv(data):
        sops, qs, ls, us_b, rv0, factor, x, z, y = prep(data)

        def body(c, _):
            x, z, y, rho = c
            rv = admm.rho_vector(ls, us_b, rho)
            x, z, y = one_iter(sops, qs, ls, us_b, rv, factor, x, z, y)
            return (x, z, y, rho), ()

        (x, z, y, _), _ = lax.scan(body, (x, z, y, rho0), None, length=T)
        return x

    report("scan_rv", timed3(scan_rv, lambda i: (perturb(data0, i),)))

    # 3. outer scan over chunks, inner STATIC fori ------------------------
    @jax.jit
    def chunks_static(data):
        sops, qs, ls, us_b, rv, factor, x, z, y = prep(data)

        def chunk(c, _):
            def inner(j, xzy):
                return one_iter(sops, qs, ls, us_b, rv, factor, *xzy)

            return lax.fori_loop(0, CHUNK, inner, c), ()

        (x, z, y), _ = lax.scan(chunk, (x, z, y), None, length=T // CHUNK)
        return x

    report("chunks_static",
           timed3(chunks_static, lambda i: (perturb(data0, i),)))

    # 4. while_loop outer, DYNAMIC interval from carry --------------------
    @jax.jit
    def chunks_while(data):
        sops, qs, ls, us_b, rv, factor, x, z, y = prep(data)

        def cond(s):
            return s[3] < T

        def body(s):
            x, z, y, it, iv = s

            def inner(j, xzy):
                return one_iter(sops, qs, ls, us_b, rv, factor, *xzy)

            x, z, y = lax.fori_loop(0, iv, inner, (x, z, y))
            # data-dependent next interval (mimics backoff plumbing)
            iv2 = jnp.where(x[0] > 1e30, iv + 1, iv).astype(jnp.int32)
            return (x, z, y, it + iv, iv2)

        s = lax.while_loop(
            cond, body, (x, z, y, jnp.asarray(0, jnp.int32),
                         jnp.asarray(CHUNK, jnp.int32)))
        return s[0]

    report("chunks_while", timed3(chunks_while, lambda i: (perturb(data0, i),)))

    # 5. + residual check per chunk ---------------------------------------
    @jax.jit
    def chunks_while_chk(data):
        q, l, u = qlu(data)
        sops, qs, ls, us_b, rv, factor, x, z, y = prep(data)
        D, E, c_s = scaling0.D, scaling0.E, scaling0.c
        q_norm = jnp.max(jnp.abs(q))

        def cond(s):
            return jnp.logical_not(s[5]) & (s[3] < T)

        def body(s):
            x, z, y, it, iv, done = s

            def inner(j, xzy):
                return one_iter(sops, qs, ls, us_b, rv, factor, *xzy)

            x, z, y = lax.fori_loop(0, iv, inner, (x, z, y))
            Ax = sops.matvec_A(x) / E
            Px = sops.matvec_P(x) / (c_s * D)
            Aty = sops.rmatvec_A(y) / (c_s * D)
            prim = jnp.max(jnp.abs(Ax - z / E))
            dual = jnp.max(jnp.abs(Px + q + Aty))
            ep = 1e-12 + 1e-12 * jnp.maximum(jnp.max(jnp.abs(Ax)),
                                             jnp.max(jnp.abs(z / E)))
            ed = 1e-12 + 1e-12 * jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))),
                q_norm)
            done = (prim <= ep) & (dual <= ed)
            return (x, z, y, it + iv, iv, done)

        s = lax.while_loop(
            cond, body,
            (x, z, y, jnp.asarray(0, jnp.int32),
             jnp.asarray(CHUNK, jnp.int32), jnp.asarray(False)))
        return s[0]

    report("chunks_while_chk",
           timed3(chunks_while_chk, lambda i: (perturb(data0, i),)))

    # 6-8. the real admm_solve at three config levels ----------------------
    def run_admm(cfg_v):
        @jax.jit
        def run(data):
            q, l, u = qlu(data)
            return admm.admm_solve(mkops(data), q, l, u, cfg_v,
                                   scaling=scaling0)

        return run

    base = dataclasses.replace(
        cfg, eps_abs=0.0, eps_rel=0.0, max_iter=T, check_every=CHUNK)
    for name, cfg_v in [
        ("admm_noada", dataclasses.replace(base, adaptive_rho=False,
                                           polish=False)),
        ("admm_ada", dataclasses.replace(base, polish=False)),
        ("admm_full", base),
    ]:
        fn = run_admm(cfg_v)
        t = timed3(fn, lambda i: (perturb(data0, i),))
        sol = fn(perturb(data0, 0))
        report(name + f" (iters={int(sol.iters)})", t)


if __name__ == "__main__":
    main()
