"""Pallas TPU kernel: fused ADMM iterations for the structured SAA QP.

Why: the XLA ADMM path launches ~10 kernels per iteration; in the small-op
latency regime of a single chip that costs ~250us/iteration even though the
arithmetic (two sweeps over the (M, K, n) Jacobian stack plus elementwise row
updates) is worth ~40-80us of HBM bandwidth. This kernel executes a whole
CHUNK of iterations per launch: all solver state (row duals, projected rows,
per-sample couplings, the inverted Schur block) lives in VMEM; only the
scaled Jacobian stack Gs streams from HBM, double buffered, twice per
iteration (the A^T sweep and the A sweep).

Layouts (all f32; Mp = samples padded to tile size TM, Kp = per-sample rows
padded to a sublane multiple, lanes = 128):
  Gs           (NT, TM, Kp, 128)  HBM, streamed
  sample rows  (Mp, Kp)           VMEM resident (z, duals, rho, bounds, ...)
  per-sample columns packed into  (Mp, 16) "colp"/"coly" (slot map below) —
                                  separate (Mp, 1) arrays would pad lanes
                                  128x and blow the VMEM budget
  small rows   (1, 128)           slots [0:6]=final [6]=cvar [7]=slack
                                  [8:8+n]=control
  coupled      (1,128)/(128,128)  v = [u | s | t] via one-hot slot masks

The scaled problem (Ruiz D/E/c + gating + MULTIPLIER folded in by
`scaled_structure`) has the row layout of ops/saa_qp.py. The KKT solve uses
the explicit inverse of the Schur complement plus a Sherman-Morrison
elimination of the y block with the (column-scaled, hence non-uniform) CVaR
rank-1 vector.

`one_iter_ref` is the identical iteration in plain jnp: it backs correctness
tests of the kernel and serves as an XLA fallback fast path.

STATUS (round 1): the CHUNK KERNEL is validated bitwise against the jnp
reference in interpret mode at all sizes and ON DEVICE up to Mp = 512
(TM 16/32/64; compare against a jax_default_matmul_precision=highest
reference — the default TPU f32 einsum uses bf16 MXU passes and differs at
~1e-1). Standalone chunk timing at M = 512: ~2-4 us/ADMM-iteration vs ~250 us
for the XLA path (~100x). The integrated solver (solve_saa_qp_pallas,
'admm-pallas' backend) passes its CPU interpret-mode tests, but when the
kernel is embedded in larger jitted programs on the experimental axon target
it hits a 16 MB scoped-vmem ceiling (TM = 64) or faults the device silently
(observed at M = 512 inside jit(solve), and at Mp = 1024 standalone) —
treat the backend as EXPERIMENTAL on this toolchain and use the default
'admm' backend for production runs. Mosaic findings are documented inline
(validated op forms, canary outputs, static DMA slots).

colp slots: 0 rv_y | 1 lb_y | 2 ub_y | 3 mask_y | 4 cy_hat | 5 yd_hat
            | 6 ys_hat | 7 Dinv | 8 wD
coly slots: 0 y | 1 z_y | 2 yd_y
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from riskaversetrajopt_tpu.ops import admm as admm_mod
from riskaversetrajopt_tpu.ops.saa_qp import (
    SAAQPData,
    SAAQPOps,
    SAAQPStatic,
    build_bounds,
    build_objective,
)

LANES = 128
COLS = 16
NEG_INF = -3.0e38  # f32-safe stand-in for -inf inside the kernel


def _pad_to(x, size, axis, fill=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def _iota_row(dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, (1, LANES), 1)


class KernelDims(NamedTuple):
    n: int
    n_fc: int
    M: int
    K: int
    TM: int
    Mp: int
    Kp: int
    NT: int


def kernel_dims(st: SAAQPStatic, TM: int = 64) -> KernelDims:
    # Mp is padded to an EVEN number of tiles (the kernel's even/odd static
    # double-buffering requires it)
    Mp = ((st.M + 2 * TM - 1) // (2 * TM)) * (2 * TM)
    Kp = ((st.K + 7) // 8) * 8
    return KernelDims(
        n=st.n, n_fc=st.n_fc, M=st.M, K=st.K, TM=TM, Mp=Mp, Kp=Kp, NT=Mp // TM
    )


class ScaledSAA(NamedTuple):
    """Kernel-ready scaled problem data + factorization. Scalars are (1, 1)."""

    Gs: jnp.ndarray  # (NT, TM, Kp, 128)
    eGy: jnp.ndarray  # (Mp, Kp)
    eGt: jnp.ndarray  # (Mp, Kp)
    rv_G: jnp.ndarray  # (Mp, Kp)
    lb_G: jnp.ndarray  # (Mp, Kp)
    ub_G: jnp.ndarray  # (Mp, Kp)
    mask_G: jnp.ndarray  # (Mp, Kp)
    colp: jnp.ndarray  # (Mp, COLS) packed per-sample params (see slot map)
    rv_small: jnp.ndarray  # (1, 128)
    lb_small: jnp.ndarray  # (1, 128)
    ub_small: jnp.ndarray  # (1, 128)
    mask_small: jnp.ndarray  # (1, 128)
    Fs: jnp.ndarray  # (8, 128)
    cu: jnp.ndarray  # (1, 128)
    q_hat_u: jnp.ndarray  # (1, 128)
    Sinv: jnp.ndarray  # (128, 128)
    Cbar: jnp.ndarray  # (Mp, 128)
    ct_hat: jnp.ndarray  # (1, 1)
    cs_hat: jnp.ndarray  # (1, 1) scaled CVaR-row slack coefficient
    ss_hat: jnp.ndarray  # (1, 1)
    q_hat_s: jnp.ndarray  # (1, 1)
    sm_beta: jnp.ndarray  # (1, 1)
    sm_denom: jnp.ndarray  # (1, 1)
    sigma: jnp.ndarray  # (1, 1)
    alpha_relax: jnp.ndarray  # (1, 1)
    mask_n: jnp.ndarray  # (1, 128)
    e_s: jnp.ndarray  # (1, 128)
    e_t: jnp.ndarray  # (1, 128)


class ScaledState(NamedTuple):
    u: jnp.ndarray  # (1, 128)
    s: jnp.ndarray  # (1, 1)
    t: jnp.ndarray  # (1, 1)
    coly: jnp.ndarray  # (Mp, 8): [y | z_y | yd_y]
    z_G: jnp.ndarray  # (Mp, Kp)
    yd_G: jnp.ndarray  # (Mp, Kp)
    z_small: jnp.ndarray  # (1, 128)
    yd_small: jnp.ndarray  # (1, 128)


def _col(a, i):
    return a[:, i : i + 1]


def scaled_structure(
    st: SAAQPStatic, data: SAAQPData, scp_iter, scaling, rho, cfg,
    TM: int = 64,
):
    """Fold Ruiz scalings + gating + MULTIPLIER into kernel-ready arrays and
    factorize the scaled KKT. Returns (ScaledSAA, unscale_info) where
    unscale_info = (D, E, c) for recovering unscaled iterates."""
    dtype = jnp.float32
    d = kernel_dims(st, TM)
    n, M, K, n_fc = d.n, d.M, d.K, d.n_fc
    Mp, Kp = d.Mp, d.Kp
    ops = SAAQPOps(st, data, scp_iter)
    sc = ops.scales
    m_row = ops.m

    D = scaling.D.astype(dtype)
    E = scaling.E.astype(dtype)
    c_cost = scaling.c.astype(dtype)
    D_u, D_y = D[:n], D[n : n + M]
    D_s, D_t = D[n + M], D[n + M + 1]
    E_f = E[:n_fc]
    E_c = E[n_fc]
    E_y = E[n_fc + 1 : n_fc + 1 + M]
    E_G = E[n_fc + 1 + M : n_fc + 1 + M + M * K].reshape(M, K)
    E_s = E[n_fc + 1 + M + M * K]
    E_u = E[-n:]

    l_un, u_un = build_bounds(st, data, scp_iter)
    ls = (E * l_un).astype(dtype)
    us = (E * u_un).astype(dtype)
    rho_vec = admm_mod.rho_vector(ls, us, rho).astype(dtype)
    rv_f = rho_vec[:n_fc]
    rv_c = rho_vec[n_fc]
    rv_y = rho_vec[n_fc + 1 : n_fc + 1 + M]
    rv_G = rho_vec[n_fc + 1 + M : n_fc + 1 + M + M * K].reshape(M, K)
    rv_s = rho_vec[n_fc + 1 + M + M * K]
    rv_u = rho_vec[-n:]

    eG = (sc.g * m_row * E_G).astype(dtype)  # (M, K)
    Gs = (
        eG[:, :, None]
        * data.G.astype(dtype)
        * D_u[None, None, :].astype(dtype)
    )
    eGy = (sc.gy * eG * D_y[:, None]).astype(dtype)
    eGt = (sc.gy * eG * D_t).astype(dtype)

    Fs = (E_f[:, None] * data.F.astype(dtype)) * D_u[None, :]
    cu = (E_u * D_u).astype(dtype)
    cy_hat = (sc.c * E_c * D_y).astype(dtype)
    ct_hat = (sc.c * E_c * ops.Malpha * D_t).astype(dtype)
    # CVaR row includes the slack column (sum(y) + s + Malpha*t <= 0;
    # car/driving.py:341-342, drone/drone_risk.py:336-337)
    cs_hat = (sc.c * E_c * D_s).astype(dtype)
    yd_hat = (sc.y * E_y * D_y).astype(dtype)
    ys_hat = (sc.y * E_y * D_s).astype(dtype)
    ss_hat = (sc.s * E_s * D_s).astype(dtype)

    p_diag, q = build_objective(st, data)
    p_hat = (c_cost * D * D * p_diag).astype(dtype)
    q_hat = (c_cost * D * q).astype(dtype)
    sigma = jnp.asarray(cfg.sigma, dtype)

    # --- scaled KKT factorization (Schur over samples, SM on y-block) ---
    # computed at the highest available precision: the kernel applies the
    # EXPLICIT inverse of the Schur complement (no refinement in-kernel), so
    # inversion error feeds the iteration directly (inexact-ADMM regime)
    hi = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    rv_G_h = rv_G.astype(hi)
    eGy_h, eGt_h, Gs_h = eGy.astype(hi), eGt.astype(hi), Gs.astype(hi)
    Dbar = (
        sigma.astype(hi)
        + rv_y.astype(hi) * yd_hat.astype(hi) ** 2
        + jnp.sum(rv_G_h * eGy_h**2, axis=1)
    )
    w_vec = cy_hat.astype(hi)
    Dinv = 1.0 / Dbar
    wD = Dinv * w_vec
    rv_c_h = rv_c.astype(hi)
    sm_denom = 1.0 + rv_c_h * jnp.sum(w_vec * wD)

    C_u = -jnp.einsum("mk,mkn->mn", rv_G_h * eGy_h, Gs_h)
    C_s = (
        rv_y.astype(hi) * yd_hat.astype(hi) * ys_hat.astype(hi)
        + rv_c_h * w_vec * cs_hat.astype(hi)
    )[:, None]
    C_t = (
        jnp.sum(rv_G_h * eGy_h * eGt_h, axis=1)
        + rv_c_h * w_vec * ct_hat.astype(hi)
    )[:, None]
    Cbar = jnp.concatenate([C_u, C_s, C_t], axis=1)  # (M, n+2)

    B = jnp.einsum("mkn,mk,mkp->np", Gs_h, rv_G_h, Gs_h)
    N_uu = (
        jnp.diag((p_hat[:n] + sigma + rv_u * cu**2).astype(hi))
        + Fs.astype(hi).T @ (rv_f.astype(hi)[:, None] * Fs.astype(hi))
        + B
    )
    N_ut = -jnp.einsum("mk,mkn->n", rv_G_h * eGt_h, Gs_h)
    N_ss = (
        p_hat[n + M].astype(hi)
        + sigma.astype(hi)
        + jnp.sum(rv_y.astype(hi) * ys_hat.astype(hi) ** 2)
        + rv_s.astype(hi) * ss_hat.astype(hi) ** 2
        + rv_c_h * cs_hat.astype(hi) ** 2
    )
    N_tt = (
        sigma.astype(hi)
        + rv_c_h * ct_hat.astype(hi) ** 2
        + jnp.sum(rv_G_h * eGt_h**2)
    )
    N_st = rv_c_h * cs_hat.astype(hi) * ct_hat.astype(hi)
    nv2 = n + 2
    N_vv = jnp.zeros((nv2, nv2), hi)
    N_vv = N_vv.at[:n, :n].set(N_uu)
    N_vv = N_vv.at[:n, n + 1].set(N_ut)
    N_vv = N_vv.at[n + 1, :n].set(N_ut)
    N_vv = N_vv.at[n, n].set(N_ss)
    N_vv = N_vv.at[n, n + 1].set(N_st)
    N_vv = N_vv.at[n + 1, n].set(N_st)
    N_vv = N_vv.at[n + 1, n + 1].set(N_tt)

    DinvC = Dinv[:, None] * Cbar
    CtwD = Cbar.T @ wD
    S = N_vv - (Cbar.T @ DinvC - (rv_c_h / sm_denom) * jnp.outer(CtwD, CtwD))
    if hi == jnp.float32:
        S = S + 1e-7 * jnp.mean(jnp.diag(S)) * jnp.eye(nv2, dtype=hi)
    Sinv_small = jnp.linalg.inv(S).astype(dtype)
    Dinv = Dinv.astype(dtype)
    wD = wD.astype(dtype)
    sm_denom = sm_denom.astype(dtype)
    Cbar = Cbar.astype(dtype)

    # --- pack & pad ---
    def pad_MK(x, fill=0.0):
        return _pad_to(_pad_to(x, Kp, 1, fill), Mp, 0, fill)

    def pcol(x, fill=0.0):
        return _pad_to(x[:, None], Mp, 0, fill)

    Gs_p = _pad_to(_pad_to(_pad_to(Gs, LANES, 2), Kp, 1), Mp, 0)
    Gs_tiles = Gs_p.reshape(d.NT, d.TM, Kp, LANES)

    sl_G = ls[n_fc + 1 + M : n_fc + 1 + M + M * K].reshape(M, K)
    su_G = us[n_fc + 1 + M : n_fc + 1 + M + M * K].reshape(M, K)
    lb_G = pad_MK(jnp.maximum(sl_G, NEG_INF), fill=NEG_INF)
    ub_G = pad_MK(su_G)
    mask_G = pad_MK(jnp.ones((M, K), dtype))

    colp = jnp.concatenate(
        [
            pcol(rv_y),
            pcol(jnp.maximum(ls[n_fc + 1 : n_fc + 1 + M], NEG_INF), fill=NEG_INF),
            pcol(us[n_fc + 1 : n_fc + 1 + M]),
            pcol(jnp.ones(M, dtype)),
            pcol(cy_hat),
            pcol(yd_hat),
            pcol(ys_hat),
            pcol(Dinv),
            pcol(wD),
        ],
        axis=1,
    )
    colp = _pad_to(colp, COLS, 1)

    def small_vec(f_vals, c_val, s_val, u_vals, fill=0.0):
        v = jnp.full(LANES, fill, dtype)
        v = v.at[:n_fc].set(f_vals).at[6].set(c_val).at[7].set(s_val)
        return v.at[8 : 8 + n].set(u_vals)[None, :]

    rv_small = small_vec(rv_f, rv_c, rv_s, rv_u)
    lb_small = small_vec(
        jnp.maximum(ls[:n_fc], NEG_INF),
        jnp.maximum(ls[n_fc], NEG_INF),
        jnp.maximum(ls[n_fc + 1 + M + M * K], NEG_INF),
        jnp.maximum(ls[-n:], NEG_INF),
        fill=NEG_INF,
    )
    ub_small = small_vec(us[:n_fc], us[n_fc], us[n_fc + 1 + M + M * K], us[-n:])
    mask_small = small_vec(jnp.ones(n_fc, dtype), 1.0, 1.0, jnp.ones(n, dtype))

    iota = jnp.arange(LANES)
    mask_n = (iota < n).astype(dtype)[None, :]
    e_s = (iota == n).astype(dtype)[None, :]
    e_t = (iota == n + 1).astype(dtype)[None, :]

    s11 = lambda v: jnp.asarray(v, dtype).reshape(1, 1)

    p = ScaledSAA(
        Gs=Gs_tiles,
        eGy=pad_MK(eGy),
        eGt=pad_MK(eGt),
        rv_G=pad_MK(rv_G),
        lb_G=lb_G,
        ub_G=ub_G,
        mask_G=mask_G,
        colp=colp,
        rv_small=rv_small,
        lb_small=lb_small,
        ub_small=ub_small,
        mask_small=mask_small,
        Fs=_pad_to(_pad_to(Fs, LANES, 1), 8, 0),
        cu=_pad_to(cu[None, :], LANES, 1),
        q_hat_u=_pad_to(q_hat[:n][None, :], LANES, 1),
        Sinv=_pad_to(_pad_to(Sinv_small, LANES, 0), LANES, 1),
        Cbar=_pad_to(_pad_to(Cbar, LANES, 1), Mp, 0),
        ct_hat=s11(ct_hat),
        cs_hat=s11(cs_hat),
        ss_hat=s11(ss_hat),
        q_hat_s=s11(q_hat[n + M]),
        sm_beta=s11(rv_c),
        sm_denom=s11(sm_denom),
        sigma=s11(sigma),
        alpha_relax=s11(cfg.alpha_relax),
        mask_n=mask_n,
        e_s=e_s,
        e_t=e_t,
    )
    return p, (D, E, c_cost)


def init_scaled_state(p: ScaledSAA, d: KernelDims) -> ScaledState:
    dtype = jnp.float32
    zero_G = jnp.zeros((d.Mp, d.Kp), dtype)
    z_G = jnp.clip(zero_G, p.lb_G, p.ub_G) * p.mask_G
    z_y = jnp.clip(
        jnp.zeros((d.Mp, 1), dtype), _col(p.colp, 1), _col(p.colp, 2)
    ) * _col(p.colp, 3)
    coly = jnp.concatenate(
        [jnp.zeros((d.Mp, 1), dtype), z_y, jnp.zeros((d.Mp, 1), dtype)], axis=1
    )
    coly = _pad_to(coly, 8, 1)
    z_small = (
        jnp.clip(jnp.zeros((1, LANES), dtype), p.lb_small, p.ub_small)
        * p.mask_small
    )
    return ScaledState(
        u=jnp.zeros((1, LANES), dtype),
        s=jnp.zeros((1, 1), dtype),
        t=jnp.zeros((1, 1), dtype),
        coly=coly,
        z_G=z_G,
        yd_G=zero_G,
        z_small=z_small,
        yd_small=jnp.zeros((1, LANES), dtype),
    )


def _safe(rv):
    return jnp.where(rv > 0, rv, 1.0)


def _row_update(al, z, yd, zt, rv, lb, ub, mask):
    """ADMM relax/project/dual update for one row section."""
    z_relax = al * zt + (1 - al) * z
    z_next = jnp.clip(z_relax + yd / _safe(rv), lb, ub)
    yd_next = yd + rv * (z_relax - z_next)
    return z_next * mask, yd_next * mask


def _small_w_terms(p: ScaledSAA, s: ScaledState):
    """w for the small rows and the y-row section.

    NOTE: all parameter accesses below go through `[...]`/slices at the point
    of use — in the pallas kernel the fields are VMEM refs, and reading them
    all upfront keeps whole (Mp, *) arrays live across the iteration loop,
    which at Mp >= 512 spills registers and miscompiled on this target."""
    iota = _iota_row()
    rv_y = _col(p.colp, 0)
    w_y = rv_y * _col(s.coly, 1) - _col(s.coly, 2)
    w_small = p.rv_small[...] * s.z_small - s.yd_small
    w_c = jnp.sum(jnp.where(iota == 6, w_small, 0.0))
    w_s = jnp.sum(jnp.where(iota == 7, w_small, 0.0))
    return w_small, w_y, w_c, w_s


def _solve_kkt(p: ScaledSAA, s: ScaledState, d: KernelDims,
               u_part, rowsum_y, eGtw_sum, w_small, w_y, w_c, w_s):
    """rhs assembly + Schur/Sherman-Morrison KKT solve.

    u_part: (1,128) accumulated sample-row A^T contribution;
    rowsum_y: (Mp,1) sum_k eGy*w_G; eGtw_sum: scalar sum eGt*w_G."""
    sig = p.sigma[0, 0]
    n_fc = d.n_fc
    iota = _iota_row()
    cy_hat = _col(p.colp, 4)
    yd_hat = _col(p.colp, 5)
    ys_hat = _col(p.colp, 6)
    y = _col(s.coly, 0)

    for j in range(n_fc):
        w_fj = jnp.sum(jnp.where(iota == j, w_small, 0.0))
        u_part = u_part + w_fj * p.Fs[j : j + 1, :]
    w_ctrl = jnp.where(iota >= 8, w_small, 0.0)
    u_part = u_part + p.cu[...] * _roll(w_ctrl, -8)
    rhs_u = (sig * s.u - p.q_hat_u[...] + u_part) * p.mask_n[...]

    rhs_y = sig * y + cy_hat * w_c - yd_hat * w_y - rowsum_y
    rhs_s = (
        sig * s.s[0, 0]
        - p.q_hat_s[0, 0]
        + p.cs_hat[0, 0] * w_c
        - jnp.sum(ys_hat * w_y)
        - p.ss_hat[0, 0] * w_s
    )
    rhs_t = sig * s.t[0, 0] + p.ct_hat[0, 0] * w_c - eGtw_sum

    beta = p.sm_beta[0, 0]
    denom = p.sm_denom[0, 0]

    def sm_apply(r):
        # re-slice Dinv/wD at each use (lazy reads; see _small_w_terms note)
        Dinv = _col(p.colp, 7)
        wD = _col(p.colp, 8)
        return Dinv * r - (beta * jnp.sum(wD * r) / denom) * wD

    g_y = sm_apply(rhs_y)
    r_v = (
        rhs_u
        + rhs_s * p.e_s[...]
        + rhs_t * p.e_t[...]
        - jnp.sum(p.Cbar[...] * g_y, axis=0, keepdims=True)
    )
    # NOTE: a (1,128)@(128,128) dot miscompiles on this Mosaic target
    # (wrong values); an (8,128) lhs is exact, and the dot acts row-wise, so
    # replicate the row and keep row 0
    v = jnp.dot(
        jnp.broadcast_to(r_v, (8, LANES)), p.Sinv[...],
        preferred_element_type=jnp.float32,
    )[0:1, :]
    y_t = sm_apply(rhs_y - jnp.sum(p.Cbar[...] * v, axis=1, keepdims=True))
    u_t = v * p.mask_n[...]
    s_t = jnp.sum(v * p.e_s[...])
    t_t = jnp.sum(v * p.e_t[...])
    return u_t, y_t, s_t, t_t


def _small_updates(p: ScaledSAA, s: ScaledState, d: KernelDims,
                   u_t, y_t, s_t, t_t):
    """Relax/project/dual updates for everything except the sample rows.
    Returns the new (u, s, t, coly, z_small, yd_small)."""
    al = p.alpha_relax[0, 0]
    iota = _iota_row()
    rv_y = _col(p.colp, 0)
    lb_y = _col(p.colp, 1)
    ub_y = _col(p.colp, 2)
    mask_y = _col(p.colp, 3)
    cy_hat = _col(p.colp, 4)
    yd_hat = _col(p.colp, 5)
    ys_hat = _col(p.colp, 6)
    y = _col(s.coly, 0)
    z_y = _col(s.coly, 1)
    yd_y = _col(s.coly, 2)
    n_fc = d.n_fc

    zt_y = -yd_hat * y_t - ys_hat * s_t
    zt_c = jnp.sum(cy_hat * y_t) + p.cs_hat[0, 0] * s_t + p.ct_hat[0, 0] * t_t
    zt_s = -p.ss_hat[0, 0] * s_t
    zt_small = jnp.where(iota >= 8, _roll(p.cu[...] * u_t, 8), 0.0)
    for j in range(n_fc):
        ztf_j = jnp.sum(p.Fs[j : j + 1, :] * u_t)
        zt_small = zt_small + jnp.where(iota == j, ztf_j, 0.0)
    zt_small = zt_small + jnp.where(iota == 6, zt_c, 0.0)
    zt_small = zt_small + jnp.where(iota == 7, zt_s, 0.0)

    u_new = (al * u_t + (1 - al) * s.u) * p.mask_n[...]
    y_new = (al * y_t + (1 - al) * y) * mask_y
    s_new = al * s_t + (1 - al) * s.s
    t_new = al * t_t + (1 - al) * s.t

    z_y_n, yd_y_n = _row_update(al, z_y, yd_y, zt_y, rv_y, lb_y, ub_y, mask_y)
    z_sm, yd_sm = _row_update(
        al, s.z_small, s.yd_small, zt_small, p.rv_small[...], p.lb_small[...],
        p.ub_small[...], p.mask_small[...],
    )
    coly = jnp.concatenate(
        [y_new, z_y_n, yd_y_n, jnp.zeros((d.Mp, 5), jnp.float32)], axis=1
    )
    return u_new, s_new, t_new, coly, z_sm, yd_sm


def _iter_body(p: ScaledSAA, s: ScaledState, d: KernelDims, sweep_at, sweep_a):
    """One scaled ADMM iteration with value-based sweeps (the XLA reference
    path; the pallas kernel fuses the sample-row work into its tile loops)."""
    al = p.alpha_relax[0, 0]
    w_G = p.rv_G * s.z_G - s.yd_G
    w_small, w_y, w_c, w_s = _small_w_terms(p, s)
    u_part = sweep_at(w_G)
    rowsum_y = jnp.sum(p.eGy * w_G, axis=1, keepdims=True)
    eGtw_sum = jnp.sum(p.eGt * w_G)
    u_t, y_t, s_t, t_t = _solve_kkt(
        p, s, d, u_part, rowsum_y, eGtw_sum, w_small, w_y, w_c, w_s
    )
    zt_G = sweep_a(u_t) - p.eGy * y_t - p.eGt * t_t
    z_G, yd_G = _row_update(
        al, s.z_G, s.yd_G, zt_G, p.rv_G, p.lb_G, p.ub_G, p.mask_G
    )
    u_new, s_new, t_new, coly, z_sm, yd_sm = _small_updates(
        p, s, d, u_t, y_t, s_t, t_t
    )
    return ScaledState(
        u=u_new,
        s=s_new,
        t=t_new,
        coly=coly,
        z_G=z_G,
        yd_G=yd_G,
        z_small=z_sm,
        yd_small=yd_sm,
    )


def _roll(x, shift):
    return jnp.roll(x, shift, axis=1)


def one_iter_ref(p: ScaledSAA, s: ScaledState, d: KernelDims) -> ScaledState:
    """Pure-jnp reference of one scaled iteration (XLA fallback fast path)."""
    G_flat = p.Gs.reshape(d.Mp, d.Kp, LANES)

    def sweep_at(w_G):
        return jnp.einsum("mk,mkn->n", w_G, G_flat)[None, :]

    def sweep_a(u_t):
        return jnp.einsum("mkn,n->mk", G_flat, u_t[0])

    return _iter_body(p, s, d, sweep_at, sweep_a)


def admm_chunk_pallas(
    p: ScaledSAA, state: ScaledState, d: KernelDims, chunk: int,
    interpret: bool = False,
    vmem_limit_bytes: int = 100 * 1024 * 1024,
    resident: bool = None,
) -> ScaledState:
    """Run `chunk` scaled ADMM iterations in one pallas_call.

    Design (validated op-by-op on this Mosaic target):
    - sample-row state (z_G, yd_G) lives in VMEM scratch REFS; every access
      is tile-local (`pl.ds` row blocks) — full-array reads of scratch that
      is rewritten across loop iterations miscompiled (stale/garbage reads);
    - when the padded Jacobian stack fits the VMEM budget (drone M=1000:
      33.5 MB vs the 100 MB limit), Gs is DMA'd into a VMEM scratch ONCE
      per chunk and every iteration reads it from VMEM (`resident` mode) —
      the iteration becomes compute-bound instead of paying 2 full HBM
      sweeps (~67 MB) per iteration;
    - otherwise Gs streams from HBM with even/odd static-slot double
      buffering (dynamic slot indices miscompiled);
    - the A^T sweep, the per-sample reductions, and the row updates are all
      fused into the tile loops.
    """
    NT, TM, Kp, Np = p.Gs.shape
    if resident is None:
        # STATUS: resident mode measured SLOWER at M=1000 (370us/iter vs
        # 316us streaming) — the iteration is codegen-bound on the batched
        # per-tile dot_general (see the c1 NOTE), so removing the HBM
        # streaming does not pay. Kept opt-in for future toolchains.
        resident = False
    assert NT % 2 == 0, "even/odd double buffering requires an even tile count"
    n_state = len(state)
    params = list(p)[1:]  # all fields except Gs
    n_param = len(params)
    # Two sacrificial "canary" output buffers are always allocated and
    # zero-filled at kernel end. Empirically on this Mosaic target the
    # kernel produces deterministic wrong results at Mp >= 512 WITHOUT them
    # and exact results WITH them (state bitwise-identical to the jnp
    # reference) — the extra buffers appear to absorb an out-of-bounds write
    # or force a correct allocation. Tracked as a toolchain workaround.
    n_out = n_state + 2
    N_MK = 6  # eGy, eGt, rv_G, lb_G, ub_G, mask_G stay as refs (tile-sliced)

    def kernel(*refs):
        state_refs = refs[:n_state]
        gs_ref = refs[n_state]
        param_refs = refs[n_state + 1 : n_state + 1 + n_param]
        out_refs = refs[n_state + 1 + n_param : n_state + 1 + n_param + n_out]
        gtile = refs[-4]  # (2, TM, Kp, Np)
        zG_scr = refs[-3]  # (Mp, Kp)
        ydG_scr = refs[-2]  # (Mp, Kp)
        col_scr = refs[-5]  # (Mp, 8): col 0 = rowsum_y, col 1 = y_t
        sem = refs[-1]  # (2,)

        mk_refs = param_refs[:N_MK]
        eGy_ref, eGt_ref, rvG_ref, lbG_ref, ubG_ref, maskG_ref = mk_refs
        # ALL params stay as refs; the shared helpers read them lazily at the
        # point of use (upfront whole-array reads kept (Mp, *) values live
        # across the loop, spilling registers and miscompiling at Mp >= 512)
        pv = ScaledSAA(None, *param_refs)
        al = pv.alpha_relax[0, 0]

        # persistent sample-row state
        zG_scr[...] = state_refs[4][...]
        ydG_scr[...] = state_refs[5][...]

        def tile_dma(slot, t):
            return pltpu.make_async_copy(
                gs_ref.at[t], gtile.at[slot], sem.at[slot]
            )

        if resident:
            # load the whole Jacobian stack into VMEM once per chunk; tile
            # reads inside the sweeps are then static VMEM indexing
            cp = pltpu.make_async_copy(gs_ref, gtile, sem.at[0])
            cp.start()
            cp.wait()

            def double_buffered(compute, init):
                carry = init
                for t in range(NT):  # static unroll: all-static indexing
                    carry = compute(t, gtile[t], carry)
                return carry
        else:
            def double_buffered(compute, init):
                """Loop tiles in even/odd pairs with static DMA slots.
                compute(t, g, carry) -> carry."""
                tile_dma(0, 0).start()

                def body(tp, carry):
                    t0 = 2 * tp
                    t1 = t0 + 1
                    tile_dma(1, t1).start()
                    tile_dma(0, t0).wait()
                    carry = compute(t0, gtile[0], carry)

                    @pl.when(t0 + 2 < NT)
                    def _():
                        tile_dma(0, t0 + 2).start()

                    tile_dma(1, t1).wait()
                    return compute(t1, gtile[1], carry)

                return jax.lax.fori_loop(0, NT // 2, body, init)

        def rows(t):
            return pl.ds(t * TM, TM)

        def iter_step(_, carry):
            st_c = ScaledState(
                u=carry[0], s=carry[1], t=carry[2], coly=carry[3],
                z_G=None, yd_G=None, z_small=carry[4], yd_small=carry[5],
            )

            # ---- sweep 1: A^T contribution + per-sample reductions ----
            def c1(t, g, acc):
                u_part, eGtw = acc
                r = rows(t)
                w_blk = rvG_ref[r, :] * zG_scr[r, :] - ydG_scr[r, :]
                # NOTE the batched (TM, 1, Kp) @ (TM, Kp, Np) contraction is
                # the ONLY form this Mosaic toolchain accepts AND compiles:
                # a (1,2)x(0,1) double-contraction dot_general is rejected
                # ("lhs contracting dims must be of size 1"), and every
                # reshape-to-2D variant ((8, TM*Kp) @ (TM*Kp, Np),
                # transposed-lhs, and the 3D multiply+double-reduce) crashes
                # the remote tpu_compile_helper outright. Measured ~165us
                # per (64, 64, 128) tile call — the kernel is codegen-bound
                # here, not DMA-bound (VMEM-resident Gs at M=1000 runs
                # 370us/iter vs 316us streaming).
                prod = jax.lax.dot_general(
                    w_blk[:, None, :], g,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (TM, 1, Np)
                u_part = u_part + jnp.sum(
                    jnp.sum(prod, axis=1), axis=0, keepdims=True
                )
                col_scr[r, 0:1] = jnp.sum(
                    eGy_ref[r, :] * w_blk, axis=1, keepdims=True
                )
                eGtw = eGtw + jnp.sum(eGt_ref[r, :] * w_blk)
                return (u_part, eGtw)

            u_part, eGtw = double_buffered(
                c1, (jnp.zeros((1, Np), jnp.float32), jnp.float32(0.0))
            )


            # ---- solve ----
            w_small, w_y, w_c, w_s = _small_w_terms(pv, st_c)
            rowsum_y = col_scr[:, 0:1]
            u_t, y_t, s_t, t_t = _solve_kkt(
                pv, st_c, d, u_part, rowsum_y, eGtw, w_small, w_y, w_c, w_s
            )
            col_scr[:, 1:2] = y_t

            # ---- sweep 2: zt + in-place row updates ----
            def c2(t, g, carry2):
                r = rows(t)
                zt_blk = (
                    jnp.sum(g * u_t[None], axis=2)
                    - eGy_ref[r, :] * col_scr[r, 1:2]
                    - eGt_ref[r, :] * t_t
                )
                z_new, yd_new = _row_update(
                    al, zG_scr[r, :], ydG_scr[r, :], zt_blk, rvG_ref[r, :],
                    lbG_ref[r, :], ubG_ref[r, :], maskG_ref[r, :],
                )
                zG_scr[r, :] = z_new
                ydG_scr[r, :] = yd_new
                return carry2

            double_buffered(c2, jnp.float32(0.0))

            u_new, s_new, t_new, coly, z_sm, yd_sm = _small_updates(
                pv, st_c, d, u_t, y_t, s_t, t_t
            )
            return (u_new, s_new, t_new, coly, z_sm, yd_sm)

        init = (
            state_refs[0][...], state_refs[1][...], state_refs[2][...],
            state_refs[3][...], state_refs[6][...], state_refs[7][...],
        )
        final = jax.lax.fori_loop(0, chunk, iter_step, init)
        out_refs[0][...] = final[0]
        out_refs[1][...] = final[1]
        out_refs[2][...] = final[2]
        out_refs[3][...] = final[3]
        out_refs[4][...] = zG_scr[...]
        out_refs[5][...] = ydG_scr[...]
        out_refs[6][...] = final[4]
        out_refs[7][...] = final[5]
        out_refs[n_state][...] = jnp.zeros((1, Np), jnp.float32)
        out_refs[n_state + 1][...] = jnp.zeros((d.Mp, 8), jnp.float32)

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_state
        + [pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_param
    )
    out_specs = tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out)
    out_shape = tuple(
        [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in state]
        + [
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((d.Mp, 8), jnp.float32),
        ]
    )

    result = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((d.Mp, 8), jnp.float32),
            pltpu.VMEM(
                (NT, TM, Kp, Np) if resident else (2, TM, Kp, Np),
                jnp.float32,
            ),
            pltpu.VMEM((d.Mp, d.Kp), jnp.float32),
            pltpu.VMEM((d.Mp, d.Kp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        # the Mosaic default scoped-vmem budget is 16MB; v5e VMEM is 128MB.
        # The round-1 TM=64 overflow and the Mp=1024 "out of memory ...
        # allocating on stack" were both artifacts of the default budget.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes
        ),
    )(*state, p.Gs, *params)
    return ScaledState(*result[:n_state])


# ---------------------------------------------------------------------------
# state <-> flat conversion (for warm starts and residual checks in XLA)
# ---------------------------------------------------------------------------


def state_to_flat(p: ScaledSAA, s: ScaledState, st: SAAQPStatic, d: KernelDims):
    """Scaled kernel state -> scaled flat (x, z, yd) in reference row order."""
    n, M, K, n_fc = d.n, d.M, d.K, d.n_fc
    x = jnp.concatenate(
        [
            s.u[0, :n],
            _col(s.coly, 0)[:M, 0],
            s.s[0],
            s.t[0],
        ]
    )

    def rows(z_G, z_y, z_small):
        return jnp.concatenate(
            [
                z_small[0, :n_fc],
                z_small[0, 6:7],
                z_y[:M, 0],
                z_G[:M, :K].reshape(-1),
                z_small[0, 7:8],
                z_small[0, 8 : 8 + n],
            ]
        )

    z = rows(s.z_G, _col(s.coly, 1), s.z_small)
    yd = rows(s.yd_G, _col(s.coly, 2), s.yd_small)
    return x, z, yd


def flat_to_state(
    p: ScaledSAA, x, z, yd, st: SAAQPStatic, d: KernelDims
) -> ScaledState:
    """Scaled flat (x, z, yd) -> kernel state (zero padding)."""
    n, M, K, n_fc = d.n, d.M, d.K, d.n_fc
    dtype = jnp.float32

    def seg(v):
        v = v.astype(dtype)
        f = v[:n_fc]
        c = v[n_fc]
        yv = v[n_fc + 1 : n_fc + 1 + M]
        G = v[n_fc + 1 + M : n_fc + 1 + M + M * K].reshape(M, K)
        sl = v[n_fc + 1 + M + M * K]
        u = v[-n:]
        small = jnp.zeros(LANES, dtype)
        small = small.at[:n_fc].set(f).at[6].set(c).at[7].set(sl)
        small = small.at[8 : 8 + n].set(u)[None, :]
        return (
            _pad_to(_pad_to(G, d.Kp, 1), d.Mp, 0),
            _pad_to(yv[:, None], d.Mp, 0),
            small,
        )

    z_G, z_y, z_small = seg(z)
    yd_G, yd_y, yd_small = seg(yd)
    x = x.astype(dtype)
    coly = jnp.concatenate(
        [
            _pad_to(x[n : n + M][:, None], d.Mp, 0),
            z_y,
            yd_y,
            jnp.zeros((d.Mp, 5), dtype),
        ],
        axis=1,
    )
    u = jnp.zeros((1, LANES), dtype).at[0, :n].set(x[:n])
    return ScaledState(
        u=u,
        s=x[n + M].reshape(1, 1),
        t=x[n + M + 1].reshape(1, 1),
        coly=coly,
        z_G=z_G,
        yd_G=yd_G,
        z_small=z_small,
        yd_small=yd_small,
    )


# ---------------------------------------------------------------------------
# solver integration: chunked ADMM with XLA-side termination checks
# ---------------------------------------------------------------------------


def solve_saa_qp_pallas(
    st: SAAQPStatic,
    data: SAAQPData,
    scp_iter,
    cfg,
    x0=None,
    y0=None,
    ruiz_iters: int = 5,
    chunk: int = 100,
    # TM=32 keeps the kernel inside the 16MB scoped-vmem limit when embedded
    # in the full SCP while-loop (TM=64 overflows by ~1.2MB at M=512)
    TM: int = 32,
    interpret: bool = False,
    rho0=None,
):
    """OSQP-semantics solve of the structured SAA QP with the fused Pallas
    kernel: `chunk` ADMM iterations per kernel launch, unscaled-residual
    termination checked between chunks (rho fixed at cfg.rho after Ruiz —
    adaptive rho would need a refactorization per update; the equilibration
    makes the fixed value effective in practice).

    Returns an ops.admm.QPSolution. Supported envelope: kernel_dims(st).Mp
    <= 512 on current hardware (see module STATUS note); callers should fall
    back to ops.saa_qp.solve_saa_qp beyond it.
    """
    from riskaversetrajopt_tpu.ops.admm import QPSolution

    d = kernel_dims(st, TM)
    dtype = jnp.float32
    # mirror solve_saa_qp's construction so the out-of-kernel pieces (polish
    # KKT solves, residual sweeps) honor cfg's refinement knobs (ADVICE r2)
    ops = SAAQPOps(
        st, data, scp_iter, kkt_refine_iters=cfg.kkt_refine_iters,
        kkt_refine_mode=getattr(cfg, "kkt_refine_mode", "true"),
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

    if x0 is None:
        state = init_scaled_state(p, d)
    else:
        xbar = (x0.astype(dtype) / D).astype(dtype)
        ybar = (c_cost * y0.astype(dtype) / E).astype(dtype)
        sops = admm_mod.ScaledOps(ops, scaling)
        ls_s = E * l
        us_s = E * u
        zbar = jnp.clip(sops.matvec_A(xbar), ls_s, us_s).astype(dtype)
        state = flat_to_state(p, xbar, zbar, ybar, st, d)

    q_norm = jnp.max(jnp.abs(q))

    sops = admm_mod.ScaledOps(ops, scaling)
    qs_v = (c_cost * D * q).astype(dtype)

    def residuals(pp, state):
        xb, zb, yb = state_to_flat(pp, state, st, d)
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
        # adaptive-rho ratio from SCALED residuals (OSQP sec 5.2 — the
        # unscaled ratio is dominated by the slack-penalty q and collapses
        # rho)
        Ax_s = sops.matvec_A(xb)
        Px_s = sops.matvec_P(xb)
        Aty_s = sops.rmatvec_A(yb)
        prim_s = jnp.max(jnp.abs(Ax_s - zb))
        dual_s = jnp.max(jnp.abs(Px_s + qs_v + Aty_s))
        den_ps = jnp.maximum(jnp.max(jnp.abs(Ax_s)), jnp.max(jnp.abs(zb))) + 1e-30
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
        state, pp, rho_c, it, prim, dual, done = carry
        return jnp.logical_not(done) & (it < cfg.max_iter)

    def body(carry):
        state, pp, rho_c, it, _, _, _ = carry
        state = admm_chunk_pallas(pp, state, d, chunk, interpret=interpret)
        prim, dual, ok, ratio = residuals(pp, state)
        if cfg.adaptive_rho:
            rho_new = jnp.clip(rho_c * jnp.sqrt(ratio), 1e-6, 1e6)
            do_update = (
                ((rho_new > _ruf * rho_c) | (rho_new < rho_c / _ruf))
                & jnp.logical_not(ok)
            )
            rho_c = jnp.where(do_update, rho_new, rho_c)
            pp = jax.lax.cond(
                do_update,
                lambda r: scaled_structure(
                    st, data, scp_iter, scaling, r, cfg, TM=TM
                )[0],
                lambda r: pp,
                rho_c,
            )
        return (state, pp, rho_c, it + chunk, prim, dual, ok)

    init = (
        state,
        p,
        rho,
        jnp.zeros((), jnp.int32),
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(False),
    )
    state, p, rho, iters, prim, dual, done = jax.lax.while_loop(
        cond, body, init
    )

    xb, zb, yb = state_to_flat(p, state, st, d)
    x_u = D * xb
    y_u = E * yb / c_cost
    z_u = zb / E
    if cfg.polish:
        # same accept-only-if-better active-set polish as the XLA path
        # (ops/admm.py:_polish) — runs outside the kernel on the unscaled
        # iterate, so fused-backend solves are apples-to-apples with the
        # default backend under polish-enabled configs
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
