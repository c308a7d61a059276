"""Bisect-by-deletion: which part of admm_solve's loop costs the extra
~125 us/iteration vs a structurally identical hand-built loop?

Measured so far (M=1000, T=2000, TPU v5e, refine=1):
  hand-built chunked loop (fori inner, dynamic interval)   120 us/iter
  real admm_solve, ANY check_every, adaptive/polish off    245 us/iter

This tool reimplements admm_solve's while loop verbatim with strip knobs:
  full         verbatim copy (expect ~245)
  no_infeas    drop infeasibility certificates + prev_* caches from carry
  no_factor    factor NOT in the carry (closure from init)
  no_rv        rho_vector hoisted out of one_iter (computed per chunk)
  no_check     residuals check replaced by a trivial max
  minimal      all of the above

Run detached on TPU:
  setsid nohup python -u tools/bisect_iter3.py > /tmp/bisect3.log 2>&1 &
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
        print(f"{name:14s} {t*1e3:9.2f} ms total  {t/T*1e6:8.2f} us/iter",
              flush=True)

    def build(no_infeas=False, no_factor=False, no_rv=False,
              no_check=False):
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
            q_norm = jnp.max(jnp.abs(q))
            factor0 = sops.factorize(rho_vector(ls, us_b, rho0), sigma_vec)

            def one_iter(x, z, y, rho, factor, rv_h):
                rv = rho_vector(ls, us_b, rho) if rv_h is None else rv_h
                rhs = sigma_vec * x - qs + sops.rmatvec_A(rv * z - y)
                xt = sops.kkt_solve(factor, rhs, rv, sigma_vec)
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
                Ax = Ax_s / E
                zu = z / E
                Px = Px_s / (c * D)
                Aty = Aty_s / (c * D)
                prim = jnp.max(jnp.abs(Ax - zu))
                dual = jnp.max(jnp.abs(Px + q + Aty))
                return prim, dual, (Ax, Px, Aty)

            # carry: x z y x_prev y_prev rho [factor] it prim dual done
            #        [prev_Ax prev_Px prev_Aty] interval
            def body(s):
                (x, z, y, xp, yp, rho, factor, it, prim, dual, done,
                 pAx, pPx, pAty, iv) = s
                f_use = factor0 if no_factor else factor
                rv_h = rho_vector(ls, us_b, rho) if no_rv else None

                def inner(j, xzy):
                    return one_iter(*xzy, rho, f_use, rv_h)

                x2, z2, y2 = lax.fori_loop(0, iv, inner, (x, z, y))
                if no_check:
                    prim2 = jnp.max(jnp.abs(x2))
                    dual2 = prim2
                    cur = (pAx, pPx, pAty)
                else:
                    prim2, dual2, cur = residuals(x2, z2, y2)
                done2 = (prim2 <= 0.0) & (dual2 <= 0.0)
                if not no_infeas:
                    dy = (y2 - yp) * E / c
                    dx = (x2 - xp) * D
                    # inline certificate prescreen (same arithmetic)
                    eps_inf = 1e-3
                    dy_n = jnp.max(jnp.abs(dy))
                    sup = jnp.sum(
                        jnp.where(dy > 0,
                                  jnp.where(jnp.isfinite(u), u, jnp.inf) * dy,
                                  0.0)
                    ) + jnp.sum(
                        jnp.where(dy < 0,
                                  jnp.where(jnp.isfinite(l), l, -jnp.inf) * dy,
                                  0.0)
                    )
                    p_scr = ((dy_n > 1e-10)
                             & (jnp.max(jnp.abs(cur[2] - pAty)) <= eps_inf * dy_n)
                             & (sup <= eps_inf * dy_n))
                    dx_n = jnp.max(jnp.abs(dx))
                    d_scr = ((dx_n > 1e-10)
                             & (jnp.max(jnp.abs(cur[1] - pPx)) <= eps_inf * dx_n))

                    def exact():
                        ops_u = mkops(data)
                        return (jnp.max(jnp.abs(ops_u.rmatvec_A(dy))) <= 0.0,
                                jnp.max(jnp.abs(ops_u.matvec_P(dx))) <= 0.0)

                    pi, di = lax.cond(
                        p_scr | d_scr, exact,
                        lambda: (jnp.asarray(False), jnp.asarray(False)))
                    done2 = done2 | pi | di
                return (x2, z2, y2, x, y, rho, factor, it + iv, prim2, dual2,
                        done2, cur[0], cur[1], cur[2], iv)

            def cond(s):
                return jnp.logical_not(s[10]) & (s[7] < T)

            prim0, dual0, cur0 = residuals(x, z, y)
            init = (x, z, y, x, y, rho0, factor0, jnp.asarray(0, jnp.int32),
                    prim0, dual0, jnp.asarray(False), cur0[0], cur0[1],
                    cur0[2], jnp.asarray(CHUNK, jnp.int32))
            s = lax.while_loop(cond, body, init)
            return s[0]

        return run

    for name, kw in [
        ("full", {}),
        ("no_infeas", dict(no_infeas=True)),
        ("no_factor", dict(no_factor=True)),
        ("no_rv", dict(no_rv=True)),
        ("no_check", dict(no_check=True)),
        ("minimal", dict(no_infeas=True, no_factor=True, no_rv=True,
                         no_check=True)),
    ]:
        fn = build(**kw)
        t = b1.timed3(fn, lambda i: (perturb(data0, i),))
        report(name, t)


if __name__ == "__main__":
    main()
