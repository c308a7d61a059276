"""Risk estimators: VaR / AVaR (CVaR) of sampled statistics.

The reference estimates AVaR by solving the Rockafellar-Uryasev LP as an OSQP
QP with M+1 variables and 2M rows per evaluation (car/driving.py:639-671,
drone/drone_risk.py:663-695, hopper/hopper.py:926-958) and VaR by a sort-order
statistic (drone/drone_main_plot.py:640-652). The QP's optimizer t* is exactly
the empirical alpha-VaR, so on TPU both reduce to one sort — no solver. A
QP-backed path is kept for parity validation (tests cross-check the two).
"""

from __future__ import annotations

import jax.numpy as jnp


def var_sorted(Z, alpha):
    """Empirical VaR_alpha: smallest t with (1/M) sum 1{Z_i > t} <= alpha.

    Matches monte_carlo_var (drone_main_plot.py:640-652): the
    (floor(alpha*M)+1)-th largest sample."""
    M = Z.shape[0]
    Z_sorted = jnp.sort(Z)
    xth = jnp.floor(alpha * M).astype(jnp.int32)
    return Z_sorted[M - xth - 1]


def avar(Z, alpha):
    """Empirical AVaR_alpha (a.k.a. CVaR): t* + mean(max(Z - t*, 0)) / alpha
    with t* the empirical VaR — the closed-form optimum of the
    Rockafellar-Uryasev program the reference solves as a QP
    (car/driving.py:639-671)."""
    t = var_sorted(Z, alpha)
    return t + jnp.mean(jnp.maximum(Z - t, 0.0)) / alpha


def avar_qp(Z, alpha, cfg=None):
    """QP-backed AVaR estimator reproducing the reference formulation exactly
    (inf_t t + 1/(M alpha) sum y_i s.t. y >= 0, y >= Z - t), for parity
    validation against `avar`. Uses the IPM backend."""
    import numpy as _np

    from riskaversetrajopt_tpu.ops.admm import DenseQPOps
    from riskaversetrajopt_tpu.ops.ipm import IPMConfig, solve_qp_ipm

    Z = jnp.asarray(Z)
    M = Z.shape[0]
    nv = M + 1
    dtype = Z.dtype
    P = jnp.zeros((nv, nv), dtype)
    q = jnp.concatenate([jnp.full(M, 1.0 / (M * alpha), dtype), jnp.ones(1, dtype)])
    A = jnp.zeros((2 * M, nv), dtype)
    A = A.at[:M, :M].set(-jnp.eye(M, dtype=dtype))
    A = A.at[M:, :M].set(-jnp.eye(M, dtype=dtype))
    A = A.at[M:, -1].set(-1.0)
    l = jnp.full(2 * M, -jnp.inf, dtype)
    u = jnp.concatenate([jnp.zeros(M, dtype), -Z])
    ops = DenseQPOps(P, A)
    sol = solve_qp_ipm(ops, q, l, u, n_eq=0, cfg=cfg or IPMConfig(tol=1e-8))
    t_risk = sol.x[-1]
    return t_risk + jnp.mean(jnp.maximum(Z - t_risk, 0.0) / alpha)
