"""Decompose the M=1000 SCP solve into component costs on the real TPU.

Methodology: each component is applied R times inside one jitted lax.scan
whose carry perturbs the component's *relevant* inputs (so XLA cannot hoist
the work out of the loop and the runtime result-cache never sees a repeat);
per-call cost is the slope (t(R2) - t(R1)) / (R2 - R1), which cancels both
dispatch latency and compile residue. A perturb-only null chain calibrates
the chaining overhead, which is subtracted where the chain perturbs G.

Run detached on TPU:  setsid nohup python -u tools/profile_scp.py > /tmp/prof.log 2>&1 &
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_default_matmul_precision", "highest")

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from riskaversetrajopt_tpu.core.config import DroneScenario, SCPConfig, SolverConfig
from riskaversetrajopt_tpu.models.drone import DroneModel
from riskaversetrajopt_tpu.ops import admm
from riskaversetrajopt_tpu.ops.rollout import linearize_batch
from riskaversetrajopt_tpu.ops.saa_qp import (
    SAAQPOps,
    build_bounds,
    build_objective,
    pack_saa_qp_data,
    solve_saa_qp,
)
from riskaversetrajopt_tpu.scp.driver import SAATrajOpt

M = int(os.environ.get("PROF_M", "1000"))
R1, R2 = 8, 24


def make_opt():
    return SAATrajOpt(
        DroneModel(DroneScenario()),
        method="saa",
        scp_cfg=SCPConfig(num_iters=15, gate_iters=2, gate_row_scale=1e-7,
                          gate_bound_l=-0.1, gate_bound_u=0.1),
        qp_backend="admm",
        admm_cfg=SolverConfig(eps_abs=1e-4, eps_rel=1e-4, max_iter=20000,
                              polish=True, kkt_refine_iters=1),
        dtype=jnp.float32,
    )


def timed(fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    return time.perf_counter() - t0, out


def rate(build, *args, label=""):
    """Per-call seconds from the R2-R1 slope; median of 3 slope estimates."""
    fns = {R: build(R) for R in (R1, R2)}
    # compile both
    for R in (R1, R2):
        timed(fns[R], *args)
    slopes = []
    for _ in range(3):
        t_a, _ = timed(fns[R1], *args)
        t_b, _ = timed(fns[R2], *args)
        slopes.append((t_b - t_a) / (R2 - R1))
    s = float(np.median(slopes))
    print(f"{label:34s} {s*1e3:9.3f} ms/call", flush=True)
    return s


def main():
    opt = make_opt()
    model = opt.model
    st = opt._static_for(M)
    mc = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), model.consts())
    pdu = opt.p_diag_u.astype(jnp.float32)
    omegas = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32), opt.sample(jax.random.PRNGKey(0), M=M)
    )
    alpha = jnp.asarray(0.2, jnp.float32)
    us0 = model.initial_guess().astype(jnp.float32)
    cfg = opt.admm_cfg
    n = st.n

    @jax.jit
    def define_once(us, om, a, mcc, pd):
        m = model.bind(mcc)
        lin = linearize_batch(m, us, om)
        return pack_saa_qp_data(lin, us.reshape(-1), pd, a)

    data0 = jax.block_until_ready(define_once(us0, omegas, alpha, mc, pdu))

    # representative converged state for polish/check inputs: solve iter 5
    @jax.jit
    def qp_once(data, it):
        return solve_saa_qp(st, data, it, cfg)

    sol5 = jax.block_until_ready(qp_once(data0, jnp.asarray(5)))
    print(f"setup: qp@iter5 iters={int(sol5.iters)} solved={bool(sol5.solved)}",
          flush=True)

    it5 = jnp.asarray(5)

    def mkops(data):
        return SAAQPOps(st, data, it5, kkt_refine_iters=cfg.kkt_refine_iters)

    def qlu(data):
        _, q = build_objective(st, data)
        l, u = build_bounds(st, data, it5)
        return q, l, u

    # ---- null chain: perturb G + g_up only --------------------------------
    def perturb_data(data, s):
        f = 1.0 + 1e-9 * s
        return data._replace(G=data.G * f, g_up=data.g_up * f)

    def build_null(R):
        @jax.jit
        def run(data):
            def body(c, _):
                d, acc = c
                s = d.g_up[0, 0]
                return (perturb_data(d, s), acc + s), ()
            (_, acc), _ = lax.scan(body, (data, 0.0), None, length=R)
            return acc
        return run

    t_null = rate(build_null, data0, label="null (perturb G+g_up)")

    # ---- raw G sweep bandwidth --------------------------------------------
    def build_sweep(R):
        @jax.jit
        def run(G):
            def body(c, _):
                g, acc = c
                s = jnp.max(jnp.abs(g))
                return (g * (1.0 + 1e-9 * s), acc + s), ()
            (_, acc), _ = lax.scan(body, (G, 0.0), None, length=R)
            return acc
        return run

    t_sweep = rate(build_sweep, data0.G, label="one G reduce (+rewrite)")
    gbytes = data0.G.size * 4 / 1e9
    print(f"   G = {gbytes*1e3:.1f} MB; implied BW "
          f"{2*gbytes/max(t_sweep,1e-12):.0f} GB/s (read+write)", flush=True)

    # ---- define ------------------------------------------------------------
    def build_define(R):
        @jax.jit
        def run(us, om, a, mcc, pd):
            def body(c, _):
                u, acc = c
                d = define_once.__wrapped__(u, om, a, mcc, pd)
                s = d.g_up[0, 0]
                return (u * (1.0 + 1e-9 * s), acc + s), ()
            (_, acc), _ = lax.scan(body, (us, 0.0), None, length=R)
            return acc
        return run

    rate(build_define, us0, omegas, alpha, mc, pdu, label="define (linearize+pack)")

    # ---- ruiz ---------------------------------------------------------------
    def build_ruiz(R):
        @jax.jit
        def run(data):
            q0, l0, u0 = qlu(data)

            def body(c, _):
                d, acc = c
                ops = mkops(d)
                q, l, u = qlu(d)
                sc = admm.ruiz_equilibrate(ops, q, l, u, iters=5)
                s = sc.c + sc.D[0] + sc.E[0]
                return (perturb_data(d, s), acc + s), ()
            (_, acc), _ = lax.scan(body, (data, 0.0), None, length=R)
            return acc
        return run

    t_ruiz = rate(build_ruiz, data0, label="ruiz (5 sweeps) [incl null]")
    print(f"   ruiz net ~ {(t_ruiz - t_null)*1e3:.3f} ms", flush=True)

    # ---- factorize ----------------------------------------------------------
    q0, l0, u0 = qlu(data0)
    ops0 = mkops(data0)
    scaling0 = jax.jit(lambda d: admm.ruiz_equilibrate(
        mkops(d), *qlu(d), iters=5))(data0)
    jax.block_until_ready(scaling0)
    sigma_vec = jnp.full(st.n + st.M + 2, cfg.sigma, jnp.float32)
    ls0 = scaling0.E * l0
    us_b0 = scaling0.E * u0
    rho_vec0 = admm.rho_vector(ls0, us_b0, jnp.asarray(cfg.rho, jnp.float32))

    def build_fact(R):
        @jax.jit
        def run(data, scaling, rho_vec, sig):
            sops = admm.ScaledOps(mkops(data), scaling)

            def body(c, _):
                rv, acc = c
                f = sops.factorize(rv, sig)
                s = f[0][0, 0] + f[2][0]
                return (rv * (1.0 + 1e-9 * s), acc + s), ()
            (_, acc), _ = lax.scan(body, (rho_vec, 0.0), None, length=R)
            return acc
        return run

    rate(build_fact, data0, scaling0, rho_vec0, sigma_vec,
         label="factorize (einsums+chol)")

    # ---- cholesky(n+2) alone ----------------------------------------------
    S_mat = jnp.eye(n + 2, dtype=jnp.float32) * 10.0 + 0.01

    def build_chol(R):
        @jax.jit
        def run(S):
            def body(c, _):
                s_m, acc = c
                ch = jnp.linalg.cholesky(s_m)
                s = ch[0, 0]
                return (s_m * (1.0 + 1e-9 * s), acc + s), ()
            (_, acc), _ = lax.scan(body, (S, 0.0), None, length=R)
            return acc
        return run

    rate(build_chol, S_mat, label=f"cholesky({n+2}) alone")

    # ---- triangular solve pair alone ----------------------------------------
    def build_tri(R):
        @jax.jit
        def run(S, r):
            ch = jnp.linalg.cholesky(S)

            def body(c, _):
                rr, acc = c
                t1 = jax.scipy.linalg.solve_triangular(ch, rr, lower=True)
                v = jax.scipy.linalg.solve_triangular(ch.T, t1, lower=False)
                s = v[0]
                return (rr * (1.0 + 1e-9 * s) + 1e-12 * v, acc + s), ()
            (_, acc), _ = lax.scan(body, (r, 0.0), None, length=R)
            return acc
        return run

    rate(build_tri, S_mat, jnp.ones(n + 2, jnp.float32),
         label=f"tri-solve pair ({n+2})")

    # ---- one ADMM iteration (kkt_solve refine=1 + matvecs + proj) ----------
    factor0 = jax.jit(
        lambda d, sc, rv: admm.ScaledOps(mkops(d), sc).factorize(rv, sigma_vec)
    )(data0, scaling0, rho_vec0)
    jax.block_until_ready(factor0)
    qs0 = scaling0.c * scaling0.D * q0
    nv = st.n + st.M + 2
    mrows = ls0.shape[0]

    def build_iter(refine):
        def b(R):
            @jax.jit
            def run(data, scaling, factor, rho_vec, x0, z0, y0,
                    qs, ls, us_b, sig):
                ops = SAAQPOps(st, data, it5, kkt_refine_iters=refine)
                sops = admm.ScaledOps(ops, scaling)
                alpha_r = jnp.asarray(cfg.alpha_relax, jnp.float32)

                def body(c, _):
                    x, z, y = c
                    rhs = sig * x - qs + sops.rmatvec_A(rho_vec * z - y)
                    xt = sops.kkt_solve(factor, rhs, rho_vec, sig)
                    zt = sops.matvec_A(xt)
                    x = alpha_r * xt + (1 - alpha_r) * x
                    zr = alpha_r * zt + (1 - alpha_r) * z
                    z_n = jnp.clip(zr + y / rho_vec, ls, us_b)
                    y = y + rho_vec * (zr - z_n)
                    return (x, z_n, y), ()
                (xzy), _ = lax.scan(body, (x0, z0, y0), None, length=R)
                return xzy[0]
            return run
        return b

    x0 = jnp.zeros(nv, jnp.float32)
    z0 = jnp.zeros(mrows, jnp.float32)
    y0 = jnp.zeros(mrows, jnp.float32)
    rate(build_iter(1), data0, scaling0, factor0, rho_vec0, x0, z0, y0,
         qs0, ls0, us_b0, sigma_vec, label="ADMM iteration (refine=1)")
    rate(build_iter(0), data0, scaling0, factor0, rho_vec0, x0, z0, y0,
         qs0, ls0, us_b0, sigma_vec, label="ADMM iteration (refine=0)")

    # ---- residual check + infeasibility bundle ------------------------------
    def build_check(R):
        @jax.jit
        def run(data, scaling, x, z, y, q_a):
            ops = mkops(data)
            sops = admm.ScaledOps(ops, scaling)
            D, E, c = scaling.D, scaling.E, scaling.c

            def body(carry, _):
                x_, z_, y_, acc = carry
                Ax_s = sops.matvec_A(x_)
                Px_s = sops.matvec_P(x_)
                Aty_s = sops.rmatvec_A(y_)
                prim = jnp.max(jnp.abs(Ax_s / E - z_ / E))
                dual = jnp.max(jnp.abs(Px_s / (c * D) + q_a + Aty_s / (c * D)))
                # infeasibility certificates (unscaled ops)
                dy = (y_ - y_ * 0.999) * E / c
                Atdy = ops.rmatvec_A(dy)
                dx = (x_ - x_ * 0.999) * D
                Pdx = ops.matvec_P(dx)
                Adx = ops.matvec_A(dx)
                s = prim + dual + Atdy[0] + Pdx[0] + Adx[0]
                f = 1.0 + 1e-9 * s
                return (x_ * f, z_ * f, y_ * f, acc + s), ()
            (_, _, _, acc), _ = lax.scan(
                body, (x, z, y, 0.0), None, length=R)
            return acc
        return run

    rate(build_check, data0, scaling0, jnp.ones(nv, jnp.float32),
         jnp.ones(mrows, jnp.float32), jnp.ones(mrows, jnp.float32),
         q0, label="residual+infeas check")

    # ---- polish --------------------------------------------------------------
    def build_polish(R):
        @jax.jit
        def run(data, x, y, z, q_a, l_a, u_a):
            ops = mkops(data)

            def body(c, _):
                x_, y_, z_, acc = c
                xp, yp, zp = admm._polish(ops, q_a, l_a, u_a, x_, y_, z_, cfg)
                s = xp[0] + yp[0]
                f = 1.0 + 1e-9 * s
                return (x_ * f, y_ * f, z_ * f, acc + s), ()
            (_, _, _, acc), _ = lax.scan(body, (x, y, z, 0.0), None, length=R)
            return acc
        return run

    rate(build_polish, data0, sol5.x, sol5.y, sol5.z, q0, l0, u0,
         label="polish")

    # ---- full QP solves at the three regimes --------------------------------
    for it in (0, 2, 14):
        tt, sol = timed(qp_once, perturb_data(data0, jnp.asarray(1.0)),
                        jnp.asarray(it))
        tt2, sol2 = timed(qp_once, perturb_data(data0, jnp.asarray(2.0)),
                          jnp.asarray(it))
        print(f"qp solve @iter{it:2d}: t={min(tt,tt2)*1e3:8.1f} ms "
              f"iters={int(sol.iters)}/{int(sol2.iters)} "
              f"solved={bool(sol.solved)}", flush=True)

    # ---- full SCP solve ------------------------------------------------------
    res = opt.solve(omegas, alpha)
    jax.block_until_ready(res.us)
    f = 1.0 + 1e-7
    om_p = jax.tree.map(lambda x: x * f, omegas)
    t0 = time.perf_counter()
    res = opt.solve(om_p, alpha)
    np.asarray(res.us)
    t_full = time.perf_counter() - t0
    print(f"full SCP solve: {t_full*1e3:.1f} ms, qp_iters={res.qp_iters.tolist()}",
          flush=True)


if __name__ == "__main__":
    main()
