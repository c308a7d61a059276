"""Follow-up bisect: per-chunk vs per-iteration overhead in admm_solve.

bisect_iter.py measured (M=1000, T=2000, TPU v5e):
  scan_fixed 70 us/iter (= HBM speed-of-light: 4 G-sweeps x 14.4 MB at
  ~820 GB/s), chunks (inner fori of 25) 120 us/iter, real admm_solve
  245 us/iter regardless of adaptive-rho/polish. This tool separates the
  remaining +125 us/iter:

  chunks_scan        inner STATIC lax.scan(25) instead of fori_loop
  admm_refine0       real solve, kkt_refine_iters=0 (2 G-sweeps not 4)
  admm_chk100        real solve, check_every=100  (20 chunks)
  admm_chk500        real solve, check_every=500  (4 chunks)
  admm_chk2000       real solve, check_every=2000 (1 chunk)

If per-iter cost falls toward the chunks_* level as check_every grows, the
overhead is per-CHUNK (residuals+certificates+state plumbing ~3 ms/chunk);
if it stays ~245 us, the real inner iteration itself is slower.

Run detached on TPU:
  setsid nohup python -u tools/bisect_iter2.py > /tmp/bisect2.log 2>&1 &
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_default_matmul_precision", "highest")

import tools.bisect_iter as b1  # noqa: E402
from riskaversetrajopt_tpu.ops import admm  # noqa: E402
from riskaversetrajopt_tpu.ops.saa_qp import SAAQPOps  # noqa: E402
from riskaversetrajopt_tpu.ops.rollout import linearize_batch  # noqa: E402
from riskaversetrajopt_tpu.ops.saa_qp import (  # noqa: E402
    build_bounds,
    build_objective,
    pack_saa_qp_data,
)
from tools.profile_scp import make_opt  # noqa: E402

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

    def mkops(data, refine=None):
        r = cfg.kkt_refine_iters if refine is None else refine
        return SAAQPOps(st, data, it5, kkt_refine_iters=r)

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
        print(f"{name:24s} {t*1e3:9.2f} ms total  {t/T*1e6:8.2f} us/iter",
              flush=True)

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

    # inner STATIC lax.scan instead of fori_loop --------------------------
    @jax.jit
    def chunks_scan(data):
        sops, qs, ls, us_b, rv, factor, x, z, y = prep(data)

        def chunk(c, _):
            def inner(cc, _):
                return one_iter(sops, qs, ls, us_b, rv, factor, *cc), ()

            out, _ = lax.scan(inner, c, None, length=CHUNK)
            return out, ()

        (x, z, y), _ = lax.scan(chunk, (x, z, y), None, length=T // CHUNK)
        return x

    report("chunks_scan",
           b1.timed3(chunks_scan, lambda i: (perturb(data0, i),)))

    # real admm_solve sweeps ------------------------------------------------
    def run_admm(cfg_v, refine=None):
        @jax.jit
        def run(data):
            q, l, u = qlu(data)
            return admm.admm_solve(mkops(data, refine), q, l, u, cfg_v,
                                   scaling=scaling0)

        return run

    base = dataclasses.replace(
        cfg, eps_abs=0.0, eps_rel=0.0, max_iter=T, polish=False,
        adaptive_rho=False, check_backoff_max=1)
    for name, ce, refine in [
        ("admm_refine0_chk25", 25, 0),
        ("admm_chk100", 100, None),
        ("admm_chk500", 500, None),
        ("admm_chk2000", 2000, None),
    ]:
        cfg_v = dataclasses.replace(base, check_every=ce)
        fn = run_admm(cfg_v, refine)
        t = b1.timed3(fn, lambda i: (perturb(data0, i),))
        report(name, t)


if __name__ == "__main__":
    main()
