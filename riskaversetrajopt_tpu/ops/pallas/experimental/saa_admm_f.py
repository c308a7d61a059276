"""Pallas TPU kernel, lane-flat ("F") layout: fused ADMM iterations for the
structured SAA QP with both Jacobian sweeps as SINGLE unbatched MXU matmuls.

Why a second kernel layout: the original kernel (ops/pallas/saa_admm.py)
keeps sample-row state as (Mp, Kp) tiles and contracts the A^T sweep with a
batched (TM,1,Kp)@(TM,Kp,Np) dot_general — the only form the round-1/2
Mosaic toolchain accepted. Hardware probes (tools/probe_c1*.py, round 3)
show that form is codegen-bound at ~180 cycles PER SAMPLE (196 us/iter at
M=1000, TM-independent), batched (Kp,1,Mp)@(Kp,Mp,Np) costs ~2.4 us per
batch element (155 us/iter), and every VPU multiply+middle-axis-reduce
variant fails to lower ("Invalid relayout: non-singleton logical dimension
is replicated"). The XLA path is HBM-bound at ~74 us/iter theoretical
(4 G-sweeps x 15.1 MB); only a VMEM-resident kernel with efficient
contractions can break that ceiling.

The F layout stores ALL sample-row state lane-flat as (1, F), F = Kp*Mp,
flat index f = k*Mp + i (k-major), so that:

  sweep-1 (A^T w over sample rows) = bcast8(w (1,F)) @ G2 (F, Np), row 0
  sweep-2 (G u)                    = bcast8(u (1,Np)) @ G2T (Np, F), row 0

— one MXU matmul each in the (8, X) @ (X, Y) broadcast-lhs form the
original kernel already validated as EXACT (saa_admm.py:_solve_kkt NOTE:
(1,128)@(128,128) miscompiles, (8,·) lhs is exact). Per-sample reductions
become Kp static Mp-aligned lane-slice adds ((1,F) -> (1,Mp)), and the
per-sample -> sample-row broadcast is pltpu.repeat along lanes. Per-sample
scalars (the y rows, Sherman-Morrison vectors) live as (1, Mp)/(8, Mp)
LANE vectors instead of (Mp, 1) columns; the two sample<->coupled
contractions use the same bcast8 dot form against Cbar (Mp, 128) and
CbarT (128, Mp).

Both G copies are DMA'd HBM->VMEM once per chunk launch (2 x 33.5 MB at
M=1000 vs the 100 MB scoped-vmem budget; ~80 us amortized over the chunk).

Reference semantics are identical to ops/admm.py (OSQP iteration; see
saa_admm.scaled_structure for the folded Ruiz/gating/MULTIPLIER scalings,
citations at ops/saa_qp.py). Correctness oracle: saa_admm.one_iter_ref via
the state converters below (tests/test_pallas_admm.py).

STATUS (round 3, measured on v5e via tools/probe_c1d.py): the layout is
correct (interpret-mode tests green) but NOT a performance win on this
Mosaic toolchain. Even the canonical single matmuls run ~7x off peak —
bd1 (8,65536)@(65536,128) VMEM-resident: 188 us vs ~26 us theoretical;
bd2: 131 us; and the PURE ELEMENTWISE aux pass (lane-slice rowsum +
pltpu.repeat + row update on (1, F)) costs 165 us/iter because (1, F)
arrays occupy one sublane of every vreg tile (1/8 VPU utilization, no
known lane-flat remedy). Every probed form — batched dots in 3 layouts,
VPU reduces, 2D matmuls — lands at 130-200 us/iter, while the XLA path's
einsum iteration measures 90 us/iter at 81% of the HBM roofline
(4 sweeps x 15.1 MB / 819 GB/s = 74 us). Conclusion: on this target the
XLA einsum path IS the efficient implementation; the fused kernels remain
in-tree as validated experimental backends ('admm-pallas',
'admm-pallas-f') for future toolchains. The production lever that DID pay
is halving the sweep count per iteration (kkt_refine_mode='factored' with
compensated factor formation, ops/saa_qp.py) — 0.40 s vs 0.70 s per
15-iteration SCP solve at M=1000.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from riskaversetrajopt_tpu.ops import admm as admm_mod
from riskaversetrajopt_tpu.ops.pallas.experimental.saa_admm import (
    LANES,
    KernelDims,
    ScaledSAA,
    ScaledState,
    _iota_row,
    _roll,
    _row_update,
    flat_to_state,
    init_scaled_state,
    kernel_dims,
    scaled_structure,
    state_to_flat,
)
from riskaversetrajopt_tpu.ops.saa_qp import (
    SAAQPData,
    SAAQPOps,
    SAAQPStatic,
    build_bounds,
    build_objective,
)

_PRECS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


class ScaledSAAF(NamedTuple):
    """Kernel-ready F-layout problem data. Lane-flat index f = k*Mp + i."""

    G2: jnp.ndarray  # (F, Np) HBM, row f = Gs[i, k, :]
    G2T: jnp.ndarray  # (Np, F) HBM, transposed copy for sweep-2
    eGy_f: jnp.ndarray  # (1, F)
    eGt_f: jnp.ndarray  # (1, F)
    rvG_f: jnp.ndarray  # (1, F)
    lbG_f: jnp.ndarray  # (1, F)
    ubG_f: jnp.ndarray  # (1, F)
    maskG_f: jnp.ndarray  # (1, F)
    colpF: jnp.ndarray  # (16, Mp): rows = saa_admm colp slots (transposed)
    Cbar: jnp.ndarray  # (Mp, 128)
    CbarT: jnp.ndarray  # (128, Mp)
    rv_small: jnp.ndarray  # (1, 128)
    lb_small: jnp.ndarray
    ub_small: jnp.ndarray
    mask_small: jnp.ndarray
    Fs: jnp.ndarray  # (8, 128)
    cu: jnp.ndarray  # (1, 128)
    q_hat_u: jnp.ndarray  # (1, 128)
    Sinv: jnp.ndarray  # (128, 128)
    ct_hat: jnp.ndarray  # (1, 1)
    cs_hat: jnp.ndarray
    ss_hat: jnp.ndarray
    q_hat_s: jnp.ndarray
    sm_beta: jnp.ndarray
    sm_denom: jnp.ndarray
    sigma: jnp.ndarray
    alpha_relax: jnp.ndarray
    mask_n: jnp.ndarray  # (1, 128)
    e_s: jnp.ndarray
    e_t: jnp.ndarray


class ScaledStateF(NamedTuple):
    u: jnp.ndarray  # (1, 128)
    s: jnp.ndarray  # (1, 1)
    t: jnp.ndarray  # (1, 1)
    colyF: jnp.ndarray  # (8, Mp): rows [0]=y [1]=z_y [2]=yd_y
    zG_f: jnp.ndarray  # (1, F)
    ydG_f: jnp.ndarray  # (1, F)
    z_small: jnp.ndarray  # (1, 128)
    yd_small: jnp.ndarray  # (1, 128)


def _mk_to_f(x, d: KernelDims):
    """(Mp, Kp) -> (1, F) with f = k*Mp + i."""
    return x.T.reshape(1, d.Kp * d.Mp)


def _f_to_mk(x, d: KernelDims):
    return x.reshape(d.Kp, d.Mp).T


def to_f(p: ScaledSAA, d: KernelDims, G2=None, G2T=None) -> ScaledSAAF:
    """Convert kernel-ready (Mp, Kp)-layout data to the F layout.

    G2/G2T can be passed in to skip the 2x33.5 MB transposes when only the
    rho-dependent fields changed (the adaptive-rho refactorization path)."""
    Gs_mk = p.Gs.reshape(d.Mp, d.Kp, LANES)  # (NT,TM,Kp,Np) -> (Mp,Kp,Np)
    if G2 is None:
        G2 = jnp.transpose(Gs_mk, (1, 0, 2)).reshape(d.Kp * d.Mp, LANES)
    if G2T is None:
        G2T = G2.T
    return ScaledSAAF(
        G2=G2,
        G2T=G2T,
        eGy_f=_mk_to_f(p.eGy, d),
        eGt_f=_mk_to_f(p.eGt, d),
        rvG_f=_mk_to_f(p.rv_G, d),
        lbG_f=_mk_to_f(p.lb_G, d),
        ubG_f=_mk_to_f(p.ub_G, d),
        maskG_f=_mk_to_f(p.mask_G, d),
        colpF=p.colp.T,
        Cbar=p.Cbar,
        CbarT=p.Cbar.T,
        rv_small=p.rv_small,
        lb_small=p.lb_small,
        ub_small=p.ub_small,
        mask_small=p.mask_small,
        Fs=p.Fs,
        cu=p.cu,
        q_hat_u=p.q_hat_u,
        Sinv=p.Sinv,
        ct_hat=p.ct_hat,
        cs_hat=p.cs_hat,
        ss_hat=p.ss_hat,
        q_hat_s=p.q_hat_s,
        sm_beta=p.sm_beta,
        sm_denom=p.sm_denom,
        sigma=p.sigma,
        alpha_relax=p.alpha_relax,
        mask_n=p.mask_n,
        e_s=p.e_s,
        e_t=p.e_t,
    )


def state_to_f(s: ScaledState, d: KernelDims) -> ScaledStateF:
    return ScaledStateF(
        u=s.u,
        s=s.s,
        t=s.t,
        colyF=s.coly.T,
        zG_f=_mk_to_f(s.z_G, d),
        ydG_f=_mk_to_f(s.yd_G, d),
        z_small=s.z_small,
        yd_small=s.yd_small,
    )


def f_to_state(sf: ScaledStateF, d: KernelDims) -> ScaledState:
    return ScaledState(
        u=sf.u,
        s=sf.s,
        t=sf.t,
        coly=sf.colyF.T,
        z_G=_f_to_mk(sf.zG_f, d),
        yd_G=_f_to_mk(sf.ydG_f, d),
        z_small=sf.z_small,
        yd_small=sf.yd_small,
    )


def _row(a, i):
    return a[i : i + 1, :]


def admm_chunk_pallas_f(
    pf: ScaledSAAF,
    state: ScaledStateF,
    d: KernelDims,
    chunk: int,
    sweep_precision: str = "highest",
    interpret: bool = False,
    vmem_limit_bytes: int = 110 * 1024 * 1024,
) -> ScaledStateF:
    """Run `chunk` scaled ADMM iterations in one pallas_call (F layout)."""
    F = d.Kp * d.Mp
    Mp, Kp, Np = d.Mp, d.Kp, LANES
    prec = _PRECS[sweep_precision]
    n_state = len(state)
    params = list(pf)[2:]  # all fields except G2/G2T
    n_param = len(params)
    n_out = n_state + 2  # + the canary pair (see saa_admm.admm_chunk_pallas)

    def kernel(*refs):
        state_refs = refs[:n_state]
        g2_ref = refs[n_state]
        g2t_ref = refs[n_state + 1]
        param_refs = refs[n_state + 2 : n_state + 2 + n_param]
        out_refs = refs[n_state + 2 + n_param : n_state + 2 + n_param + n_out]
        g2vm = refs[-3]  # (F, Np)
        g2tvm = refs[-2]  # (Np, F)
        sem = refs[-1]  # (2,)

        pv = ScaledSAAF(None, None, *param_refs)
        al = pv.alpha_relax[0, 0]
        sig = pv.sigma[0, 0]
        beta = pv.sm_beta[0, 0]
        denom = pv.sm_denom[0, 0]
        n_fc = d.n_fc
        iota = _iota_row()

        cp0 = pltpu.make_async_copy(g2_ref, g2vm, sem.at[0])
        cp0.start()
        cp1 = pltpu.make_async_copy(g2t_ref, g2tvm, sem.at[1])
        cp1.start()
        cp0.wait()
        cp1.wait()

        def sweep1(w):  # (1, F) -> (1, Np)
            return jnp.dot(
                jnp.broadcast_to(w, (8, F)), g2vm[...],
                preferred_element_type=jnp.float32, precision=prec,
            )[0:1, :]

        def sweep2(u):  # (1, Np) -> (1, F)
            return jnp.dot(
                jnp.broadcast_to(u, (8, Np)), g2tvm[...],
                preferred_element_type=jnp.float32, precision=prec,
            )[0:1, :]

        def rowsum(w):  # (1, F) -> (1, Mp): per-sample sum over k
            acc = w[:, 0:Mp]
            for k in range(1, Kp):
                acc = acc + w[:, k * Mp : (k + 1) * Mp]
            return acc

        def tile_row(r):  # (1, Mp) -> (1, F)
            return pltpu.repeat(r, Kp, axis=1)

        def dot8(lhs, rhs_ref):
            """bcast8 exact-dot helper: (1, X) @ (X, Y) -> (1, Y)."""
            return jnp.dot(
                jnp.broadcast_to(lhs, (8, lhs.shape[1])), rhs_ref[...],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )[0:1, :]

        def sm_apply(r):
            # (1, Mp) Sherman-Morrison y-block solve (lane-major rows of
            # colpF; lazy ref slices per the saa_admm register-spill note)
            Dinv = _row(pv.colpF, 7)
            wD = _row(pv.colpF, 8)
            return Dinv * r - (beta * jnp.sum(wD * r) / denom) * wD

        def iter_step(_, carry):
            u, s_c, t_c, colyF, zG, ydG, z_small, yd_small = carry

            # ---- w terms ----
            w_f = pv.rvG_f[...] * zG - ydG  # (1, F)
            y_row = _row(colyF, 0)
            z_y = _row(colyF, 1)
            yd_y = _row(colyF, 2)
            rv_y = _row(pv.colpF, 0)
            w_y = rv_y * z_y - yd_y  # (1, Mp)
            w_small = pv.rv_small[...] * z_small - yd_small
            w_c = jnp.sum(jnp.where(iota == 6, w_small, 0.0))
            w_s = jnp.sum(jnp.where(iota == 7, w_small, 0.0))

            # ---- sweep 1 + per-sample reductions ----
            u_part = sweep1(w_f)  # (1, Np)
            rowsum_y = rowsum(pv.eGy_f[...] * w_f)  # (1, Mp)
            eGtw = jnp.sum(pv.eGt_f[...] * w_f)

            # ---- KKT rhs ----
            for j in range(n_fc):
                w_fj = jnp.sum(jnp.where(iota == j, w_small, 0.0))
                u_part = u_part + w_fj * pv.Fs[j : j + 1, :]
            w_ctrl = jnp.where(iota >= 8, w_small, 0.0)
            u_part = u_part + pv.cu[...] * _roll(w_ctrl, -8)
            rhs_u = (sig * u - pv.q_hat_u[...] + u_part) * pv.mask_n[...]

            cy_hat = _row(pv.colpF, 4)
            yd_hat = _row(pv.colpF, 5)
            ys_hat = _row(pv.colpF, 6)
            rhs_y = sig * y_row + cy_hat * w_c - yd_hat * w_y - rowsum_y
            rhs_s = (
                sig * s_c[0, 0]
                - pv.q_hat_s[0, 0]
                + pv.cs_hat[0, 0] * w_c
                - jnp.sum(ys_hat * w_y)
                - pv.ss_hat[0, 0] * w_s
            )
            rhs_t = sig * t_c[0, 0] + pv.ct_hat[0, 0] * w_c - eGtw

            # ---- Schur / Sherman-Morrison solve ----
            g_y = sm_apply(rhs_y)  # (1, Mp)
            r_v = (
                rhs_u
                + rhs_s * pv.e_s[...]
                + rhs_t * pv.e_t[...]
                - dot8(g_y, pv.Cbar)  # C^T g_y -> (1, 128)
            )
            v = dot8(r_v, pv.Sinv)  # (1, 128)
            y_t = sm_apply(rhs_y - dot8(v, pv.CbarT))  # C v -> (1, Mp)
            u_t = v * pv.mask_n[...]
            s_t = jnp.sum(v * pv.e_s[...])
            t_t = jnp.sum(v * pv.e_t[...])

            # ---- sweep 2 + sample-row update ----
            zt_f = (
                sweep2(u_t)
                - pv.eGy_f[...] * tile_row(y_t)
                - pv.eGt_f[...] * t_t
            )
            zG_n, ydG_n = _row_update(
                al, zG, ydG, zt_f, pv.rvG_f[...], pv.lbG_f[...],
                pv.ubG_f[...], pv.maskG_f[...],
            )

            # ---- y-row + small updates (saa_admm._small_updates, lane-major
            # y algebra) ----
            zt_y = -yd_hat * y_t - ys_hat * s_t  # (1, Mp)
            zt_c = (
                jnp.sum(cy_hat * y_t)
                + pv.cs_hat[0, 0] * s_t
                + pv.ct_hat[0, 0] * t_t
            )
            zt_s = -pv.ss_hat[0, 0] * s_t
            zt_small = jnp.where(iota >= 8, _roll(pv.cu[...] * u_t, 8), 0.0)
            for j in range(n_fc):
                ztf_j = jnp.sum(pv.Fs[j : j + 1, :] * u_t)
                zt_small = zt_small + jnp.where(iota == j, ztf_j, 0.0)
            zt_small = zt_small + jnp.where(iota == 6, zt_c, 0.0)
            zt_small = zt_small + jnp.where(iota == 7, zt_s, 0.0)

            mask_y = _row(pv.colpF, 3)
            u_new = (al * u_t + (1 - al) * u) * pv.mask_n[...]
            y_new = (al * y_t + (1 - al) * y_row) * mask_y
            s_new = al * s_t + (1 - al) * s_c
            t_new = al * t_t + (1 - al) * t_c
            z_y_n, yd_y_n = _row_update(
                al, z_y, yd_y, zt_y, rv_y, _row(pv.colpF, 1),
                _row(pv.colpF, 2), mask_y,
            )
            z_sm, yd_sm = _row_update(
                al, z_small, yd_small, zt_small, pv.rv_small[...],
                pv.lb_small[...], pv.ub_small[...], pv.mask_small[...],
            )
            colyF_n = jnp.concatenate(
                [y_new, z_y_n, yd_y_n, jnp.zeros((5, Mp), jnp.float32)],
                axis=0,
            )
            return (u_new, s_new, t_new, colyF_n, zG_n, ydG_n, z_sm, yd_sm)

        init = tuple(r[...] for r in state_refs)
        final = jax.lax.fori_loop(0, chunk, iter_step, init)
        for o, v in zip(out_refs[:n_state], final):
            o[...] = v
        out_refs[n_state][...] = jnp.zeros((1, Np), jnp.float32)
        out_refs[n_state + 1][...] = jnp.zeros((Mp, 8), jnp.float32)

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_state
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_param
    )
    out_shape = tuple(
        [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in state]
        + [
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 8), jnp.float32),
        ]
    )
    result = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out),
        scratch_shapes=[
            pltpu.VMEM((F, Np), jnp.float32),
            pltpu.VMEM((Np, F), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes
        ),
    )(*state, pf.G2, pf.G2T, *params)
    return ScaledStateF(*result[:n_state])


def solve_saa_qp_pallas_f(
    st: SAAQPStatic,
    data: SAAQPData,
    scp_iter,
    cfg,
    x0=None,
    y0=None,
    ruiz_iters: int = 5,
    chunk: int = 25,
    interpret: bool = False,
    rho0=None,
):
    """OSQP-semantics solve with the F-layout fused kernel: `chunk` ADMM
    iterations per launch, unscaled-residual termination + adaptive rho
    (with refactorization) between chunks — the same epoch structure as
    ops/admm.admm_solve. Mirrors saa_admm.solve_saa_qp_pallas."""
    from riskaversetrajopt_tpu.ops.admm import QPSolution

    TM = 32  # only sets the Mp padding granularity in the F layout
    d = kernel_dims(st, TM)
    dtype = jnp.float32
    ops = SAAQPOps(
        st, data, scp_iter, kkt_refine_iters=cfg.kkt_refine_iters,
        kkt_refine_mode=getattr(cfg, "kkt_refine_mode", "true"),
        sweep_precision=getattr(cfg, "sweep_precision", "highest"),
    )
    p_diag, q = build_objective(st, data)
    l, u = build_bounds(st, data, scp_iter)
    scaling = admm_mod.ruiz_equilibrate(ops, q, l, u, iters=ruiz_iters)
    rho = jnp.clip(
        jnp.asarray(cfg.rho if rho0 is None else rho0, dtype), 1e-6, 1e6
    )
    _ruf = float(getattr(cfg, "rho_update_factor", 5.0))
    p, (D, E, c_cost) = scaled_structure(
        st, data, scp_iter, scaling, rho, cfg, TM=TM
    )
    pf = to_f(p, d)
    sweep_precision = getattr(cfg, "sweep_precision", "highest")

    if x0 is None:
        state = state_to_f(init_scaled_state(p, d), d)
    else:
        xbar = (x0.astype(dtype) / D).astype(dtype)
        ybar = (c_cost * y0.astype(dtype) / E).astype(dtype)
        sops = admm_mod.ScaledOps(ops, scaling)
        ls_s = E * l
        us_s = E * u
        zbar = jnp.clip(sops.matvec_A(xbar), ls_s, us_s).astype(dtype)
        state = state_to_f(flat_to_state(p, xbar, zbar, ybar, st, d), d)

    q_norm = jnp.max(jnp.abs(q))
    sops = admm_mod.ScaledOps(ops, scaling)
    qs_v = (c_cost * D * q).astype(dtype)

    def residuals(pp_f, state_f):
        xb, zb, yb = state_to_flat(
            p, f_to_state(state_f, d), st, d
        )
        x_u = (D * xb).astype(dtype)
        z_u = (zb / E).astype(dtype)
        y_u = (E * yb / c_cost).astype(dtype)
        Ax = ops.matvec_A(x_u)
        Px = ops.matvec_P(x_u)
        Aty = ops.rmatvec_A(y_u)
        prim = jnp.max(jnp.abs(Ax - z_u))
        dual = jnp.max(jnp.abs(Px + q + Aty))
        denom_p = jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z_u)))
        denom_d = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))), q_norm
        )
        eps_prim = cfg.eps_abs + cfg.eps_rel * denom_p
        eps_dual = cfg.eps_abs + cfg.eps_rel * denom_d
        xs = xb
        Ax_s = sops.matvec_A(xs)
        Px_s = sops.matvec_P(xs)
        Aty_s = sops.rmatvec_A(yb)
        prim_s = jnp.max(jnp.abs(Ax_s - zb))
        dual_s = jnp.max(jnp.abs(Px_s + qs_v + Aty_s))
        den_ps = (
            jnp.maximum(jnp.max(jnp.abs(Ax_s)), jnp.max(jnp.abs(zb))) + 1e-30
        )
        den_ds = (
            jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(Px_s)), jnp.max(jnp.abs(Aty_s))),
                jnp.max(jnp.abs(qs_v)),
            )
            + 1e-30
        )
        ratio = (prim_s / den_ps) / (dual_s / den_ds + 1e-30)
        return prim, dual, (prim <= eps_prim) & (dual <= eps_dual), ratio

    def cond(carry):
        state_c, pp, rho_c, it, prim, dual, done = carry
        return jnp.logical_not(done) & (it < cfg.max_iter)

    def body(carry):
        state_c, pp, rho_c, it, _, _, _ = carry
        state_c = admm_chunk_pallas_f(
            pp, state_c, d, chunk, sweep_precision=sweep_precision,
            interpret=interpret,
        )
        prim, dual, ok, ratio = residuals(pp, state_c)
        if cfg.adaptive_rho:
            rho_new = jnp.clip(rho_c * jnp.sqrt(ratio), 1e-6, 1e6)
            do_update = (
                ((rho_new > _ruf * rho_c) | (rho_new < rho_c / _ruf))
                & jnp.logical_not(ok)
            )
            rho_c = jnp.where(do_update, rho_new, rho_c)
            pp = jax.lax.cond(
                do_update,
                lambda r: to_f(
                    scaled_structure(
                        st, data, scp_iter, scaling, r, cfg, TM=32
                    )[0],
                    d, G2=pp.G2, G2T=pp.G2T,
                ),
                lambda r: pp,
                rho_c,
            )
        return (state_c, pp, rho_c, it + chunk, prim, dual, ok)

    init = (
        state,
        pf,
        rho,
        jnp.zeros((), jnp.int32),
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(False),
    )
    state, pf, rho, iters, prim, dual, done = jax.lax.while_loop(
        cond, body, init
    )

    xb, zb, yb = state_to_flat(p, f_to_state(state, d), st, d)
    x_u = D * xb
    y_u = E * yb / c_cost
    z_u = zb / E
    if cfg.polish:
        x_u, y_u, z_u = admm_mod._polish(ops, q, l, u, x_u, y_u, z_u, cfg)
    return QPSolution(
        x=x_u,
        y=y_u,
        z=z_u,
        iters=iters,
        prim_res=prim,
        dual_res=dual,
        solved=done,
        rho=rho,
    )
