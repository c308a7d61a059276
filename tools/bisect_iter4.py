"""Pinpoint WHY the infeasibility-certificate block doubles admm_solve's
per-iteration cost (bisect_iter3: full 248 us/iter, no_infeas 122 us/iter).

Variants isolate the two mechanisms:
  carry_only      prev_{Ax,Px,Aty} + x_prev/y_prev kept LIVE in the while
                  carry (updated per chunk), but no certificate arithmetic
                  and no lax.cond — tests carry-extension / buffer aliasing.
  prescreen_only  full prescreen arithmetic per chunk, cond replaced by a
                  plain False — tests the delta arithmetic cost.
  cond_sweeps     prescreen + the lax.cond whose branch runs real operator
                  sweeps — tests conditional-branch compilation effects.
  consec_delta    candidate FIX shape: no prev_* in carry at all; the chunk
                  runs one extra one_iter and uses the consecutive-iterate
                  delta (OSQP's own delta definition) + 3 direct sweeps,
                  all unconditional.

Run detached on TPU:
  setsid nohup python -u tools/bisect_iter4.py > /tmp/bisect4.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_default_matmul_precision", "highest")

from riskaversetrajopt_tpu.ops import admm  # noqa: E402
from riskaversetrajopt_tpu.ops.admm import rho_vector  # noqa: E402
from riskaversetrajopt_tpu.ops.saa_qp import (  # noqa: E402
    SAAQPOps,
    build_bounds,
    build_objective,
    pack_saa_qp_data,
)
from riskaversetrajopt_tpu.ops.rollout import linearize_batch  # noqa: E402
from tools.profile_scp import make_opt  # noqa: E402
import tools.bisect_iter as b1  # noqa: E402

M = int(os.environ.get("BIS_M", "1000"))
T = int(os.environ.get("BIS_T", "2000"))
CHUNK = 25


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

    scaling0 = jax.jit(
        lambda d: admm.ruiz_equilibrate(mkops(d), *qlu(d), iters=5)
    )(data0)
    jax.block_until_ready(scaling0)
    nv = st.n + st.M + 2
    sigma_vec = jnp.full(nv, cfg.sigma, jnp.float32)
    alpha_r = jnp.asarray(cfg.alpha_relax, jnp.float32)
    rho0 = jnp.asarray(cfg.rho, jnp.float32)

    def report(name, t):
        print(f"{name:16s} {t*1e3:9.2f} ms total  {t/T*1e6:8.2f} us/iter",
              flush=True)

    def build(mode):
        @jax.jit
        def run(data):
            q, l, u = qlu(data)
            sops = admm.ScaledOps(mkops(data), scaling0)
            D, E, c = scaling0.D, scaling0.E, scaling0.c
            qs = c * D * q
            ls = E * l
            us_b = E * u
            x = jnp.zeros(nv, jnp.float32)
            y = jnp.zeros(ls.shape[0], jnp.float32)
            z = jnp.clip(sops.matvec_A(x), ls, us_b)
            factor0 = sops.factorize(rho_vector(ls, us_b, rho0), sigma_vec)

            def one_iter(x, z, y):
                rv = rho_vector(ls, us_b, rho0)
                rhs = sigma_vec * x - qs + sops.rmatvec_A(rv * z - y)
                xt = sops.kkt_solve(factor0, rhs, rv, sigma_vec)
                zt = sops.matvec_A(xt)
                x_n = alpha_r * xt + (1 - alpha_r) * x
                z_r = alpha_r * zt + (1 - alpha_r) * z
                z_n = jnp.clip(z_r + y / rv, ls, us_b)
                y_n = y + rv * (z_r - z_n)
                return x_n, z_n, y_n

            def residuals(x, z, y):
                Ax_s = sops.matvec_A(x)
                Px_s = sops.matvec_P(x)
                Aty_s = sops.rmatvec_A(y)
                prim = jnp.max(jnp.abs(Ax_s / E - z / E))
                dual = jnp.max(jnp.abs(Px_s / (c * D) + q + Aty_s / (c * D)))
                return prim, dual, (Ax_s / E, Px_s / (c * D), Aty_s / (c * D))

            def certificate(dy, dx, Atdy, Pdx):
                eps_inf = 1e-3
                dy_n = jnp.max(jnp.abs(dy))
                sup = jnp.sum(
                    jnp.where(dy > 0,
                              jnp.where(jnp.isfinite(u), u, jnp.inf) * dy, 0.0)
                ) + jnp.sum(
                    jnp.where(dy < 0,
                              jnp.where(jnp.isfinite(l), l, -jnp.inf) * dy,
                              0.0))
                p = ((dy_n > 1e-10)
                     & (jnp.max(jnp.abs(Atdy)) <= eps_inf * dy_n)
                     & (sup <= eps_inf * dy_n))
                dx_n = jnp.max(jnp.abs(dx))
                d = ((dx_n > 1e-10)
                     & (jnp.max(jnp.abs(Pdx)) <= eps_inf * dx_n))
                return p, d

            def body(s):
                (x, z, y, xp, yp, it, done, pAx, pPx, pAty) = s

                def inner(j, xzy):
                    return one_iter(*xzy)

                x2, z2, y2 = lax.fori_loop(0, CHUNK, inner, (x, z, y))
                prim, dual, cur = residuals(x2, z2, y2)
                done2 = (prim <= 0.0) & (dual <= 0.0)
                if mode == "carry_only":
                    pass  # prev_* stay live in the carry, nothing computed
                elif mode in ("prescreen_only", "cond_sweeps"):
                    dy = (y2 - yp) * E / c
                    dx = (x2 - xp) * D
                    pi, di = certificate(dy, dx, cur[2] - pAty, cur[1] - pPx)
                    if mode == "cond_sweeps":
                        ops_u = mkops(data)

                        def exact():
                            return certificate(dy, dx, ops_u.rmatvec_A(dy),
                                               ops_u.matvec_P(dx))

                        pi, di = lax.cond(
                            pi | di, exact,
                            lambda: (jnp.asarray(False), jnp.asarray(False)))
                    done2 = done2 | pi | di
                elif mode == "consec_delta":
                    x3, z3, y3 = one_iter(x2, z2, y2)
                    dy = (y3 - y2) * E / c
                    dx = (x3 - x2) * D
                    ops_u = mkops(data)
                    pi, di = certificate(dy, dx, ops_u.rmatvec_A(dy),
                                         ops_u.matvec_P(dx))
                    done2 = done2 | pi | di
                    x2, z2, y2 = x3, z3, y3
                return (x2, z2, y2, x, y, it + CHUNK, done2,
                        cur[0], cur[1], cur[2])

            def cond(s):
                return jnp.logical_not(s[6]) & (s[5] < T)

            if mode == "consec_delta":
                # prev_* and x_prev/y_prev dropped from the carry entirely
                def body2(s):
                    x, z, y, it, done = s

                    def inner(j, xzy):
                        return one_iter(*xzy)

                    x2, z2, y2 = lax.fori_loop(0, CHUNK, inner, (x, z, y))
                    prim, dual, _ = residuals(x2, z2, y2)
                    done2 = (prim <= 0.0) & (dual <= 0.0)
                    x3, z3, y3 = one_iter(x2, z2, y2)
                    dy = (y3 - y2) * E / c
                    dx = (x3 - x2) * D
                    ops_u = mkops(data)
                    pi, di = certificate(dy, dx, ops_u.rmatvec_A(dy),
                                         ops_u.matvec_P(dx))
                    return (x3, z3, y3, it + CHUNK + 1, done2 | pi | di)

                def cond2(s):
                    return jnp.logical_not(s[4]) & (s[3] < T)

                s = lax.while_loop(
                    cond2, body2,
                    (x, z, y, jnp.asarray(0, jnp.int32), jnp.asarray(False)))
                return s[0]

            prim0, dual0, cur0 = residuals(x, z, y)
            init = (x, z, y, x, y, jnp.asarray(0, jnp.int32),
                    jnp.asarray(False), cur0[0], cur0[1], cur0[2])
            s = lax.while_loop(cond, body, init)
            return s[0]

        return run

    for name in ["carry_only", "prescreen_only", "cond_sweeps",
                 "consec_delta"]:
        fn = build(name)
        t = b1.timed3(fn, lambda i: (perturb(data0, i),))
        report(name, t)


if __name__ == "__main__":
    main()
