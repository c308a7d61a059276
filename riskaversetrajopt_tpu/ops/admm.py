"""On-chip ADMM QP solver with OSQP-equivalent semantics.

Replaces the reference's native OSQP dependency (C solver called at every SCP
iteration through a Python<->C boundary, car/driving.py:430-440,
drone/drone_risk.py:433-452) with a fully jitted fixed-point loop so the whole
SCP iteration — define + solve — is one XLA computation.

Problem form (OSQP form):
    minimize    (1/2) x^T P x + q^T x
    subject to  l <= A x <= u

Algorithm (OSQP, Stellato et al. 2020):
    (P + sigma*I + A^T R A) xt = sigma*x - q + A^T (R z - y)
    zt = A xt
    x+ = alpha*xt + (1-alpha)*x
    z+ = Pi_[l,u]( alpha*zt + (1-alpha)*z + y/rho )
    y+ = y + R( alpha*zt + (1-alpha)*z - z+ )
with per-row penalties R = diag(rho_vec): rho on inequality rows,
1e3*rho on equality rows, 1e-6 on fully-loose rows (OSQP defaults), optional
adaptive rho rescaling at termination checks.

Termination (unscaled OSQP criteria):
    ||Ax - z||_inf        <= eps_abs + eps_rel * max(||Ax||_inf, ||z||_inf)
    ||Px + q + A^T y||_inf <= eps_abs + eps_rel * max(||Px||, ||A^T y||, ||q||)

The core is parameterized by an operator object so the same loop drives both
the dense instantiation below and the structured sample-sharded SAA
instantiation (ops/saa_qp.py), whose matvecs are batched einsums over the
per-sample constraint blocks with psum-able couplings.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from riskaversetrajopt_tpu.core.config import SolverConfig

_RHO_MIN = 1e-6
_RHO_MAX = 1e6
_LOOSE_RHO = 1e-6
_EQ_TOL = 1e-9


class QPSolution(NamedTuple):
    x: jnp.ndarray  # primal solution (n,)
    y: jnp.ndarray  # dual solution (m,)
    z: jnp.ndarray  # projected constraint values (m,)
    iters: jnp.ndarray  # iterations taken (scalar int)
    prim_res: jnp.ndarray
    dual_res: jnp.ndarray
    solved: jnp.ndarray  # bool


def rho_vector(l, u, rho):
    """Per-row penalty following OSQP's classification: equality rows
    (u - l <= tol) get 1e3*rho, fully-loose rows get RHO_MIN, others rho."""
    eq = (u - l) <= _EQ_TOL
    loose = jnp.isinf(-l) & jnp.isinf(u)
    rho_vec = jnp.where(eq, 1e3 * rho, rho)
    rho_vec = jnp.where(loose, _LOOSE_RHO, rho_vec)
    return jnp.clip(rho_vec, _RHO_MIN, _RHO_MAX)


class _State(NamedTuple):
    x: jnp.ndarray
    z: jnp.ndarray
    y: jnp.ndarray
    rho: jnp.ndarray  # scalar base rho (adapted)
    factor: Any
    it: jnp.ndarray
    prim_res: jnp.ndarray
    dual_res: jnp.ndarray
    done: jnp.ndarray


def admm_solve(ops, q, l, u, cfg: SolverConfig, x0=None, y0=None) -> QPSolution:
    """Run ADMM to the OSQP termination criterion.

    `ops` must provide:
      matvec_P(x) -> (n,)
      matvec_A(x) -> (m,)
      rmatvec_A(w) -> (n,)
      factorize(rho_vec, sigma) -> factor
      kkt_solve(factor, rhs, rho_vec, sigma) -> x  (solve (P+sigma I+A^T R A)x=rhs)

    x0/y0 warm-start the primal/dual iterates (OSQP warm_start=True parity,
    car/driving.py:436).
    """
    dtype = q.dtype
    n = q.shape[0]
    m = l.shape[0]
    x = jnp.zeros(n, dtype) if x0 is None else x0.astype(dtype)
    y = jnp.zeros(m, dtype) if y0 is None else y0.astype(dtype)
    z = jnp.clip(ops.matvec_A(x), l, u)
    sigma = jnp.asarray(cfg.sigma, dtype)
    alpha = jnp.asarray(cfg.alpha_relax, dtype)
    rho0 = jnp.asarray(cfg.rho, dtype)
    q_norm = jnp.max(jnp.abs(q))

    factor0 = ops.factorize(rho_vector(l, u, rho0), sigma)

    def one_iter(x, z, y, rho, factor):
        rho_vec = rho_vector(l, u, rho)
        rhs = sigma * x - q + ops.rmatvec_A(rho_vec * z - y)
        xt = ops.kkt_solve(factor, rhs, rho_vec, sigma)
        zt = ops.matvec_A(xt)
        x_next = alpha * xt + (1 - alpha) * x
        z_relax = alpha * zt + (1 - alpha) * z
        z_next = jnp.clip(z_relax + y / rho_vec, l, u)
        y_next = y + rho_vec * (z_relax - z_next)
        return x_next, z_next, y_next

    def residuals(x, z, y):
        Ax = ops.matvec_A(x)
        Px = ops.matvec_P(x)
        Aty = ops.rmatvec_A(y)
        prim = jnp.max(jnp.abs(Ax - z))
        dual = jnp.max(jnp.abs(Px + q + Aty))
        eps_prim = cfg.eps_abs + cfg.eps_rel * jnp.maximum(
            jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z))
        )
        eps_dual = cfg.eps_abs + cfg.eps_rel * jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))), q_norm
        )
        # relative residual ratio for adaptive rho (OSQP eq. 28)
        denom_p = jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z))) + 1e-30
        denom_d = (
            jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))), q_norm
            )
            + 1e-30
        )
        return prim, dual, eps_prim, eps_dual, (prim / denom_p) / (dual / denom_d + 1e-30)

    def cond(s: _State):
        return jnp.logical_not(s.done) & (s.it < cfg.max_iter)

    def body(s: _State):
        def inner(_, xzy):
            x, z, y = xzy
            return one_iter(x, z, y, s.rho, s.factor)

        x, z, y = lax.fori_loop(0, cfg.check_every, inner, (s.x, s.z, s.y))
        prim, dual, eps_prim, eps_dual, ratio = residuals(x, z, y)
        solved = (prim <= eps_prim) & (dual <= eps_dual)

        if cfg.adaptive_rho:
            rho_new = jnp.clip(s.rho * jnp.sqrt(ratio), _RHO_MIN, _RHO_MAX)
            do_update = (
                ((rho_new > 5.0 * s.rho) | (rho_new < s.rho / 5.0))
                & jnp.logical_not(solved)
            )
            rho = jnp.where(do_update, rho_new, s.rho)
            factor = lax.cond(
                do_update,
                lambda: ops.factorize(rho_vector(l, u, rho), sigma),
                lambda: s.factor,
            )
        else:
            rho, factor = s.rho, s.factor

        return _State(
            x=x,
            z=z,
            y=y,
            rho=rho,
            factor=factor,
            it=s.it + cfg.check_every,
            prim_res=prim,
            dual_res=dual,
            done=solved,
        )

    init = _State(
        x=x,
        z=z,
        y=y,
        rho=rho0,
        factor=factor0,
        it=jnp.zeros((), jnp.int32),
        prim_res=jnp.asarray(jnp.inf, dtype),
        dual_res=jnp.asarray(jnp.inf, dtype),
        done=jnp.asarray(False),
    )
    s = lax.while_loop(cond, body, init)

    x, y, z = s.x, s.y, s.z
    if cfg.polish:
        x, y, z = _polish(ops, q, l, u, x, y, z, cfg)

    return QPSolution(
        x=x,
        y=y,
        z=z,
        iters=s.it,
        prim_res=s.prim_res,
        dual_res=s.dual_res,
        solved=s.done,
    )


def _polish(ops, q, l, u, x, y, z, cfg: SolverConfig):
    """Static-shape analog of OSQP polishing: solve the KKT system with the
    active rows treated as (stiff) equalities and inactive rows dropped.

    OSQP builds a reduced equality-constrained KKT from the active set; a
    reduced system has a dynamic shape under jit, so instead we solve
    (P + sigma_p I + A^T W A) x = -q + A^T W b with W = w_big on active rows
    and 0 elsewhere, b the active bound — equivalent in the w_big limit —
    followed by refinement steps. Duals of active rows are recovered from the
    stationarity residual."""
    dtype = q.dtype
    w_big = jnp.asarray(1e7, dtype)
    sigma_p = jnp.asarray(1e-9, dtype)
    lower_active = y < -1e-12
    upper_active = y > 1e-12
    active = lower_active | upper_active
    b = jnp.where(lower_active, l, jnp.where(upper_active, u, 0.0))
    b = jnp.where(jnp.isfinite(b), b, 0.0)
    w = jnp.where(active, w_big, 0.0)

    factor = ops.factorize(w, sigma_p)
    rhs = -q + ops.rmatvec_A(w * b)
    x_pol = ops.kkt_solve(factor, rhs, w, sigma_p)
    # iterative refinement on the penalized system
    def refine(_, x_pol):
        r = rhs - (
            ops.matvec_P(x_pol)
            + sigma_p * x_pol
            + ops.rmatvec_A(w * ops.matvec_A(x_pol))
        )
        return x_pol + ops.kkt_solve(factor, r, w, sigma_p)

    x_pol = lax.fori_loop(0, cfg.polish_refine_iters, refine, x_pol)

    # recovered duals: y_active = W (A x - b) on active rows
    Ax = ops.matvec_A(x_pol)
    y_pol = jnp.where(active, w * (Ax - b), 0.0)
    z_pol = jnp.clip(Ax, l, u)

    # accept polish only if it improves both residuals (OSQP behavior)
    def resid(xx, yy, zz):
        prim = jnp.max(jnp.abs(ops.matvec_A(xx) - zz))
        dual = jnp.max(jnp.abs(ops.matvec_P(xx) + q + ops.rmatvec_A(yy)))
        return prim, dual

    p0, d0 = resid(x, y, z)
    p1, d1 = resid(x_pol, y_pol, z_pol)
    better = (p1 <= jnp.maximum(p0, 1e-10)) & (d1 <= jnp.maximum(d0, 1e-10))
    pick = lambda a, bb: jnp.where(better, a, bb)
    return pick(x_pol, x), pick(y_pol, y), pick(z_pol, z)


class DenseQPOps:
    """Dense instantiation: P (n,n), A (m,n) materialized; KKT solved by
    Cholesky of P + sigma I + A^T R A with optional iterative refinement
    (helps f32 on TPU, SURVEY.md section 7.3.1-2)."""

    def __init__(self, P, A, kkt_refine_iters: int = 1):
        self.P = P
        self.A = A
        self.kkt_refine_iters = kkt_refine_iters

    def matvec_P(self, x):
        return self.P @ x

    def matvec_A(self, x):
        return self.A @ x

    def rmatvec_A(self, w):
        return self.A.T @ w

    def _kkt_matrix(self, rho_vec, sigma):
        n = self.P.shape[0]
        return (
            self.P
            + sigma * jnp.eye(n, dtype=self.P.dtype)
            + self.A.T @ (rho_vec[:, None] * self.A)
        )

    def factorize(self, rho_vec, sigma):
        Kmat = self._kkt_matrix(rho_vec, sigma)
        return jnp.linalg.cholesky(Kmat)

    def kkt_solve(self, chol, rhs, rho_vec, sigma):
        def solve(r):
            t = jax.scipy.linalg.solve_triangular(chol, r, lower=True)
            return jax.scipy.linalg.solve_triangular(chol.T, t, lower=False)

        x = solve(rhs)
        for _ in range(self.kkt_refine_iters):
            r = rhs - (
                self.P @ x + sigma * x + self.A.T @ (rho_vec * (self.A @ x))
            )
            x = x + solve(r)
        return x


def solve_dense_qp(
    P, q, A, l, u, cfg: SolverConfig = SolverConfig(), x0=None, y0=None
) -> QPSolution:
    """One-call dense QP solve (OSQP setup+solve equivalent)."""
    ops = DenseQPOps(P, A, kkt_refine_iters=cfg.kkt_refine_iters)
    return admm_solve(ops, q, l, u, cfg, x0=x0, y0=y0)
