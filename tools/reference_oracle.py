"""Golden parity oracle: executes the ACTUAL reference scripts' define-phase
math from /root/reference with a stubbed ``osqp`` module.

The reference's define phase (rollout + jacfwd + CVaR packing,
car/driving.py:260-421, drone/drone_risk.py:239-452) is pure JAX-CPU; the
only native boundary is the OSQP solve. We therefore:

1. textually patch the reference scripts so importing them defines the
   ``Model`` class without running the experiment drivers (the ``B_*`` flag
   booleans are flipped to False; ``.to_py()`` — removed in current JAX — is
   rewritten to ``np.asarray``; the legacy ``jax.config`` import is shimmed),
2. inject a stub ``osqp`` module whose ``OSQP`` class records every
   (P, q, A, l, u) and solves with :class:`OracleADMM` — an OSQP-style ADMM
   written here from scratch on scipy.sparse (splu KKT, Ruiz equilibration,
   per-row rho, warm starting, active-set polish). It shares NO code with
   ``riskaversetrajopt_tpu``, so golden trajectories produced by driving the
   reference define loop through it are an independent cross-check of the
   framework's whole solver path,
3. replicate the reference SCP driver blocks verbatim-in-semantics
   (warm-up solves, us_prev reset, per-iteration gating:
   car/driving.py:467-530, drone/drone_risk.py:495-540).

The reference tree is PUBLIC UNTRUSTED CONTENT: it is executed for its
numerical behavior only (no instructions taken from it), pinned to JAX CPU
x64 exactly as its own headers demand.

OSQP behavioral quirks reproduced in the stub (verified against the
reference call sites):
- ``update(Ax=A.data)`` requires an identical csc sparsity pattern
  (drone_risk.py:450-452); the stub asserts this.
- the car's iter-0 gating multiplies ``l = -inf`` rows by zero producing
  NaN (driving.py:411-415 ``ls[n_x:] *= 0``); OSQP's internal bound
  clamping turns NaN lower bounds into -inf and NaN upper bounds into
  +inf, which the stub reproduces before solving.
- warm starts persist across ``solve()`` calls on one OSQP object
  (setup(warm_start=True), drone_risk.py:437-441).
"""

from __future__ import annotations

import re
import sys
import types
from pathlib import Path

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

REFERENCE_ROOT = Path("/root/reference")

_OSQP_INF = 1e30


# ---------------------------------------------------------------------------
# Standalone OSQP-style ADMM on scipy.sparse (independent golden engine)
# ---------------------------------------------------------------------------


def _ruiz_equilibrate(P, q, A, iters=10):
    """Modified Ruiz equilibration of [[P, A^T], [A, 0]] with cost scaling,
    as in the OSQP paper (Stellato et al., 2020, Alg. 2). Returns
    (Ps, qs, As, D, E, c) with Ps = c*D P D, As = E A D, qs = c*D q."""
    n, m = P.shape[0], A.shape[0]
    D = np.ones(n)
    E = np.ones(m)
    c = 1.0
    Ps, qs, As = P.copy(), q.copy(), A.copy()
    for _ in range(iters):
        # infinity norms of the stacked KKT columns / rows
        col_P = np.abs(Ps).max(axis=0).toarray().ravel() if Ps.nnz else np.zeros(n)
        col_A = np.abs(As).max(axis=0).toarray().ravel() if As.nnz else np.zeros(n)
        d = np.sqrt(np.maximum(np.maximum(col_P, col_A), 1e-10))
        d = 1.0 / np.clip(d, 1e-4, 1e4)
        row_A = np.abs(As).max(axis=1).toarray().ravel() if As.nnz else np.zeros(m)
        e = np.sqrt(np.maximum(row_A, 1e-10))
        e = 1.0 / np.clip(e, 1e-4, 1e4)
        Dd = sp.diags(d)
        Ee = sp.diags(e)
        Ps = (Dd @ Ps @ Dd).tocsc()
        As = (Ee @ As @ Dd).tocsc()
        qs = d * qs
        D *= d
        E *= e
        # cost scaling: mean column norm of P and norm of q
        cp = np.abs(Ps).max(axis=0).toarray().ravel() if Ps.nnz else np.zeros(n)
        gamma = max(np.mean(cp), np.max(np.abs(qs)) if qs.size else 0.0)
        gamma = 1.0 / np.clip(gamma, 1e-4, 1e4)
        Ps = gamma * Ps
        qs = gamma * qs
        c *= gamma
    return Ps.tocsc(), qs, As.tocsc(), D, E, c


class OracleADMM:
    """OSQP-equivalent ADMM QP solver: min 0.5 x'Px + q'x  s.t. l <= Ax <= u.

    Direct (splu) KKT solves, Ruiz equilibration, per-row rho with the 1e3
    equality scaling, residual-ratio adaptive rho with refactorization,
    unscaled termination at eps_abs/eps_rel, and OSQP-style active-set
    polishing. Written on numpy/scipy only."""

    def __init__(self, P, q, A, l, u, eps_abs=1e-3, eps_rel=1e-3,
                 max_iter=20000, rho=0.1, sigma=1e-6, alpha=1.6,
                 polish=True, check_every=25, adaptive_rho_interval=100):
        self.P = sp.csc_matrix(P)
        self.q = np.asarray(q, float)
        self.A = sp.csc_matrix(A)
        self.n = self.P.shape[0]
        self.m = self.A.shape[0]
        self.eps_abs, self.eps_rel = eps_abs, eps_rel
        self.max_iter = max_iter
        self.sigma, self.alpha = sigma, alpha
        self.polish = polish
        self.check_every = check_every
        self.adaptive_rho_interval = adaptive_rho_interval
        self.rho_bar = rho
        self.set_bounds(l, u)
        self._scale()
        self._set_rho(rho)
        self.x = np.zeros(self.n)
        self.z = np.zeros(self.m)
        self.y = np.zeros(self.m)

    # -- setup pieces ------------------------------------------------------
    def set_bounds(self, l, u):
        l = np.asarray(l, float).copy()
        u = np.asarray(u, float).copy()
        # OSQP NaN clamping (the car gating's NaN -> -inf quirk); infinities
        # stay infinite so equality/loose-row detection survives row scaling
        l[np.isnan(l)] = -np.inf
        u[np.isnan(u)] = np.inf
        l[l < -_OSQP_INF] = -np.inf
        u[u > _OSQP_INF] = np.inf
        self.l = l
        self.u = u

    def _scale(self):
        self.Ps, self.qs, self.As, self.D, self.E, self.c = _ruiz_equilibrate(
            self.P, self.q, self.A
        )
        self.ls = self.E * self.l
        self.us_b = self.E * self.u

    def _set_rho(self, rho_bar):
        self.rho_bar = rho_bar
        eq = np.isfinite(self.ls) & np.isfinite(self.us_b) & (
            np.abs(self.us_b - self.ls) < 1e-12
        )
        rho_vec = np.full(self.m, rho_bar)
        rho_vec[eq] = 1e3 * rho_bar
        loose = ~np.isfinite(self.ls) & ~np.isfinite(self.us_b)
        rho_vec[loose] = 1e-6
        self.rho_vec = np.clip(rho_vec, 1e-6, 1e6)
        K = sp.bmat(
            [
                [self.Ps + self.sigma * sp.eye(self.n), self.As.T],
                [self.As, -sp.diags(1.0 / self.rho_vec)],
            ],
            format="csc",
        )
        self._kkt = spla.splu(K)

    # -- iteration ---------------------------------------------------------
    def _residuals(self, x, z, y):
        """Unscaled residuals + the OSQP relative-scale denominators."""
        Dinv = 1.0 / self.D
        Einv = 1.0 / self.E
        x_u = self.D * x
        z_u = Einv * z
        y_u = self.E * y / self.c
        Ax = self.A @ x_u
        Px = self.P @ x_u
        Aty = self.A.T @ y_u
        prim = np.abs(Ax - z_u).max() if self.m else 0.0
        dual = np.abs(Px + self.q + Aty).max()
        prim_rel = max(np.abs(Ax).max() if self.m else 0.0,
                       np.abs(z_u).max() if self.m else 0.0)
        dual_rel = max(np.abs(Px).max(), np.abs(self.q).max(),
                       np.abs(Aty).max() if self.m else 0.0)
        return prim, dual, prim_rel, dual_rel

    def solve(self, x0=None, y0=None):
        n, m = self.n, self.m
        x = self.x if x0 is None else (1.0 / self.D) * np.asarray(x0, float)
        y = self.y if y0 is None else (self.c / self.E) * np.asarray(y0, float)
        z = np.clip(self.As @ x, self.ls, self.us_b)
        status = "maximum iterations reached"
        iters = self.max_iter
        since_adapt = 0
        for k in range(1, self.max_iter + 1):
            rhs = np.concatenate(
                [self.sigma * x - self.qs, z - y / self.rho_vec]
            )
            sol = self._kkt.solve(rhs)
            x_t = sol[:n]
            nu = sol[n:]
            z_t = z + (nu - y) / self.rho_vec
            x = self.alpha * x_t + (1 - self.alpha) * x
            z_relax = self.alpha * z_t + (1 - self.alpha) * z
            z_next = np.clip(z_relax + y / self.rho_vec, self.ls, self.us_b)
            y = y + self.rho_vec * (z_relax - z_next)
            z = z_next
            since_adapt += 1
            if k % self.check_every == 0 or k == self.max_iter:
                prim, dual, prel, drel = self._residuals(x, z, y)
                if (prim <= self.eps_abs + self.eps_rel * prel
                        and dual <= self.eps_abs + self.eps_rel * drel):
                    status, iters = "solved", k
                    break
                if since_adapt >= self.adaptive_rho_interval:
                    ratio = np.sqrt(
                        (prim / max(prel, 1e-10))
                        / max(dual / max(drel, 1e-10), 1e-10)
                    )
                    if ratio > 5.0 or ratio < 0.2:
                        self._set_rho(np.clip(self.rho_bar * ratio, 1e-6, 1e6))
                        since_adapt = 0
        self.x, self.z, self.y = x, z, y
        x_u = self.D * x
        z_u = z / self.E
        y_u = self.E * y / self.c
        if self.polish and status == "solved":
            x_p, z_p, y_p = self._polish(x_u, z_u, y_u)
            if x_p is not None:
                x_u, z_u, y_u = x_p, z_p, y_p
                status = "solved"
        return x_u, y_u, z_u, status, iters

    def _polish(self, x, z, y):
        """OSQP polishing: equality-solve on the active set with delta
        regularization and iterative refinement."""
        # active-set detection: dual sign (OSQP's rule) OR primal proximity
        # to the bound — the latter rescues polishing when the crude ADMM
        # dual has not yet resolved weakly-active rows
        z_tol = 1e-7 * max(1.0, np.abs(z).max() if self.m else 1.0)
        low = ((y < 0) | (z - self.l < z_tol)) & np.isfinite(self.l)
        upp = ((y > 0) | (self.u - z < z_tol)) & np.isfinite(self.u)
        eq = (self.u - self.l) < 1e-12
        act = low | upp | eq
        if not act.any():
            return None, None, None
        A_a = self.A[act]
        b_a = np.where(low[act] & ~eq[act], self.l[act], self.u[act])
        na = A_a.shape[0]
        delta = 1e-6
        K = sp.bmat(
            [
                [self.P + delta * sp.eye(self.n), A_a.T],
                [A_a, -delta * sp.eye(na)],
            ],
            format="csc",
        )
        try:
            lu = spla.splu(K)
        except RuntimeError:
            return None, None, None
        rhs = np.concatenate([-self.q, b_a])
        sol = lu.solve(rhs)
        # iterative refinement against the unregularized KKT
        for _ in range(3):
            r = rhs - np.concatenate(
                [
                    self.P @ sol[: self.n] + A_a.T @ sol[self.n:],
                    A_a @ sol[: self.n],
                ]
            )
            sol = sol + lu.solve(r)
        x_p = sol[: self.n]
        y_p = np.zeros(self.m)
        y_p[act] = sol[self.n:]
        z_p = self.A @ x_p
        prim = np.maximum(z_p - self.u, 0) + np.maximum(self.l - z_p, 0)
        prim_ok = prim.max() if self.m else 0.0
        dual_res = np.abs(self.P @ x_p + self.q + self.A.T @ y_p).max()
        p0, d0, _, _ = self._polish_res(x, z, y)
        if prim_ok <= max(p0, 1e-10) and dual_res <= max(d0, 1e-10):
            return x_p, np.clip(z_p, self.l, self.u), y_p
        return None, None, None

    def _polish_res(self, x, z, y):
        Ax = self.A @ x
        prim = (np.maximum(Ax - self.u, 0) + np.maximum(self.l - Ax, 0)).max()
        dual = np.abs(self.P @ x + self.q + self.A.T @ y).max()
        return prim, dual, 0.0, 0.0


# ---------------------------------------------------------------------------
# osqp stub module
# ---------------------------------------------------------------------------


class _Info:
    def __init__(self, status, iters):
        self.status = status
        self.iter = iters


class _Result:
    def __init__(self, x, y, status, iters):
        self.x = x
        self.y = y
        self.info = _Info(status, iters)


class StubOSQP:
    """Records (P, q, A, l, u) and solves with OracleADMM, reproducing the
    OSQP object's call semantics used by the reference scripts."""

    #: optional global hook: list collecting dicts of every setup/update
    recorder = None
    #: accuracy overrides for golden-trajectory generation: the reference's
    #: OSQP_TOL (1e-3) leaves per-QP noise that is an artifact of the
    #: specific solver's iterate path, not of the reference math; golden
    #: runs tighten the engine so the trajectory is the SCP map with
    #: accurate QP solves (both engines agree to ~1e-6 there; see
    #: tests/test_reference_parity.py)
    eps_override = None
    max_iter_override = None

    def __init__(self):
        self._engine = None
        self._warm = None
        self._settings = {}

    def setup(self, P, q, A, l, u, **settings):
        self._P = sp.csc_matrix(P)
        self._A = sp.csc_matrix(A)
        self._pattern = (self._A.indices.copy(), self._A.indptr.copy())
        self._q = np.asarray(q, float)
        self._l = np.asarray(l, float)
        self._u = np.asarray(u, float)
        self._settings = settings
        self._dirty = True
        if StubOSQP.recorder is not None:
            StubOSQP.recorder.append(
                {"op": "setup", "P": self._P.copy(), "q": self._q.copy(),
                 "A": self._A.copy(), "l": self._l.copy(), "u": self._u.copy()}
            )

    def update(self, l=None, u=None, Ax=None, q=None):
        if l is not None:
            self._l = np.asarray(l, float)
        if u is not None:
            self._u = np.asarray(u, float)
        if q is not None:
            self._q = np.asarray(q, float)
        if Ax is not None:
            Ax = np.asarray(Ax, float)
            if Ax.shape[0] != self._pattern[0].shape[0]:
                raise ValueError(
                    "osqp.update(Ax=...) with a different sparsity pattern "
                    f"({Ax.shape[0]} vs {self._pattern[0].shape[0]} nonzeros)"
                )
            self._A = sp.csc_matrix(
                (Ax, self._pattern[0], self._pattern[1]), shape=self._A.shape
            )
        self._dirty = True
        if StubOSQP.recorder is not None:
            StubOSQP.recorder.append(
                {"op": "update", "A": self._A.copy(), "l": self._l.copy(),
                 "u": self._u.copy(), "q": self._q.copy()}
            )

    def solve(self):
        if self._dirty:
            s = self._settings
            eps_a = StubOSQP.eps_override or s.get("eps_abs", 1e-3)
            eps_r = StubOSQP.eps_override or s.get("eps_rel", 1e-3)
            max_it = StubOSQP.max_iter_override or 20000
            self._engine = OracleADMM(
                self._P, self._q, self._A, self._l, self._u,
                eps_abs=eps_a, eps_rel=eps_r, max_iter=max_it,
                polish=s.get("polish", False),
            )
            self._dirty = False
        x0 = y0 = None
        if self._warm is not None and self._settings.get("warm_start", True):
            x0, y0 = self._warm
        x, y, z, status, iters = self._engine.solve(x0=x0, y0=y0)
        self._warm = (x, y)
        return _Result(x, y, status, iters)


def install_osqp_stub():
    mod = types.ModuleType("osqp")
    mod.OSQP = StubOSQP
    sys.modules["osqp"] = mod
    return mod


def install_ipyopt_stub():
    """Minimal ipyopt module so hopper/hopper.py and drone/drone_gaussian.py
    can be exec'd for define-phase parity (the compute blocks are patched
    off; only the import must succeed). Problem records its definition and
    solve() returns the start point unchanged with status 0."""
    if "ipyopt" in sys.modules:
        return sys.modules["ipyopt"]
    mod = types.ModuleType("ipyopt")

    class Problem:
        def __init__(self, *args, **kwargs):
            self.args = args
            self.kwargs = kwargs

        def set(self, **kwargs):
            pass

        def solve(self, z0, *a, **k):
            import numpy as _np

            return _np.asarray(z0), 0.0, 0

    mod.Problem = Problem
    sys.modules["ipyopt"] = mod
    return mod


# ---------------------------------------------------------------------------
# Reference script loading
# ---------------------------------------------------------------------------


def _install_jax_config_shim():
    """`from jax.config import config` was removed from JAX; the reference
    headers use it (car/driving.py:16-18). Shim it onto the live config,
    mapping the retired 'jax_platform_name' knob to 'jax_platforms'."""
    if "jax.config" in sys.modules:
        return
    import jax

    shim = types.ModuleType("jax.config")

    class _Cfg:
        @staticmethod
        def update(key, val):
            if key == "jax_platform_name":
                key = "jax_platforms"
            try:
                jax.config.update(key, val)
            except Exception:
                pass

    shim.config = _Cfg()
    sys.modules["jax.config"] = shim


def _patch_source(src: str) -> str:
    # don't run the experiment drivers at import
    src = re.sub(r"^(B_\w+) = True", r"\1 = False", src, flags=re.M)
    # keep the unconditional up-front sampling loop cheap
    src = re.sub(r"^num_repeats_saa = \d+", "num_repeats_saa = 1", src, flags=re.M)
    # no LaTeX at figure time (figures are never rendered here anyway)
    src = src.replace("rc('text', usetex=True)", "rc('text', usetex=False)")
    # JAX removed DeviceArray.to_py(); np.asarray is the modern equivalent
    src = re.sub(r"([A-Za-z_][A-Za-z0-9_\.]*)\.to_py\(\)", r"np.asarray(\1)", src)
    return src


_loaded: dict = {}


def load_reference_script(rel_path: str):
    """Exec a patched reference script and return its module namespace.

    rel_path e.g. 'drone/drone_risk.py' or 'car/driving.py'."""
    if rel_path in _loaded:
        return _loaded[rel_path]
    import matplotlib

    matplotlib.use("Agg", force=True)
    _install_jax_config_shim()
    install_osqp_stub()
    install_ipyopt_stub()
    path = REFERENCE_ROOT / rel_path
    src = _patch_source(path.read_text())
    moddir = str(path.parent)
    if moddir not in sys.path:
        sys.path.insert(0, moddir)
    mod = types.ModuleType("reference_" + path.stem)
    mod.__file__ = str(path)
    exec(compile(src, str(path), "exec"), mod.__dict__)
    _loaded[rel_path] = mod
    return mod


# ---------------------------------------------------------------------------
# Omega conversion + reference SCP drivers (golden trajectory generation)
# ---------------------------------------------------------------------------


def load_reference_mc(rel_path: str, mc_M: int = 2000):
    """Exec a reference script far enough INTO its Monte-Carlo validation
    block to capture the MC oracle functions (monte_carlo_cost,
    monte_carlo_no_collisions_constraint_verification / the car equivalent,
    monte_carlo_avar). The block's results-file loop raises the reference's
    own FileNotFoundError guidance (car/driving.py:724-728) — the partial
    module namespace retains everything defined before the raise. The MC
    sample count is patched down from 10000 to `mc_M` to keep the exec
    cheap; callers pass their own sample arrays to the captured functions."""
    key = (rel_path, "mc", mc_M)
    if key in _loaded:
        return _loaded[key]
    import matplotlib

    matplotlib.use("Agg", force=True)
    _install_jax_config_shim()
    install_osqp_stub()
    install_ipyopt_stub()
    path = REFERENCE_ROOT / rel_path
    src = _patch_source(path.read_text())
    src = src.replace(
        "B_validate_monte_carlo = False", "B_validate_monte_carlo = True"
    )
    src = re.sub(r"^(\s+)M = 10000$", rf"\1M = {mc_M}", src, flags=re.M)
    moddir = str(path.parent)
    if moddir not in sys.path:
        sys.path.insert(0, moddir)
    mod = types.ModuleType("reference_mc_" + path.stem)
    mod.__file__ = str(path)
    try:
        exec(compile(src, str(path), "exec"), mod.__dict__)
    except FileNotFoundError:
        pass  # expected: the MC loop needs results/ files we don't create
    _loaded[key] = mod
    return mod


def set_reference_M(ns, M: int):
    """The reference scripts size their packing from the module-global M
    (drone_risk.py:331-333, driving.py:335-337), not from the sampled
    arrays; set it before constructing a Model at a non-default M. New
    Model instances retrace their jitted methods, so the new value takes
    effect per instance."""
    ns.M = int(M)


def reference_drone_model(ns, omegas, alpha):
    """Build the reference drone Model on this framework's sampled omegas
    (drone_risk.py Model takes pre-sampled DWs/masses/obs_Qs directly)."""
    import jax.numpy as jnp

    return ns.Model(
        ns.S,
        jnp.asarray(np.asarray(omegas.dWs, float)),
        jnp.asarray(np.asarray(omegas.mass, float)),
        jnp.asarray(np.asarray(omegas.obs_Q, float)),
        "saa",
        alpha,
    )


def reference_car_model(ns, omegas, alpha):
    """Build the reference car Model, then overwrite its internally-sampled
    uncertainty with this framework's omegas (the attributes are exactly the
    ones the reference MC block reads back, driving.py:633-637)."""
    import jax.numpy as jnp

    M = int(np.asarray(omegas.omega_speed).shape[0])
    model = ns.Model(M, "saa", alpha)
    model.omegas_speed = jnp.asarray(np.asarray(omegas.omega_speed, float))
    model.omegas_repulsive = jnp.asarray(
        np.asarray(omegas.omega_repulsive, float)
    )
    model.states_init = jnp.asarray(np.asarray(omegas.state_init, float))
    model.DWs = jnp.asarray(np.asarray(omegas.dWs, float))
    return model


def run_reference_scp_drone(ns, model, num_iters, warmup=5):
    """Replicates drone_risk.py:495-532: define once (ungated), warm-up
    `warmup` update+solve rounds advancing us_prev, reset to the initial
    guess, then `num_iters` update+solve rounds. Returns (us, per-iter us)."""
    us_prev = model.initial_guess_us_mat()
    model.define_problem(us_prev, verbose=False)
    for scp_iter in range(warmup):
        model.update_problem(us_prev, scp_iter, verbose=False)
        us, _ = model.solve(verbose=False)
        us_prev = us
    us_prev = model.initial_guess_us_mat()
    history = []
    for scp_iter in range(num_iters):
        model.update_problem(us_prev, scp_iter, verbose=False)
        us, _ = model.solve(verbose=False)
        us_prev = us
        history.append(np.asarray(us))
    return np.asarray(us_prev), history


def run_reference_scp_car(ns, model, num_iters):
    """Replicates driving.py:467-513: two warm-up define+solve rounds
    (scp_iter 0 then 1), reset, then `num_iters` define+solve rounds."""
    us_prev = model.initial_guess_us_mat()
    model.define_problem(us_prev, verbose=False)
    us, _ = model.solve()
    model.define_problem(us, 1, verbose=False)
    us, _ = model.solve()
    us_prev = model.initial_guess_us_mat()
    history = []
    for scp_iter in range(num_iters):
        model.define_problem(us_prev, scp_iter, verbose=False)
        us, _ = model.solve()
        us_prev = us
        history.append(np.asarray(us))
    return np.asarray(us_prev), history


def l2_error_us(us, us_ref):
    """The reference's relative L2 metric (driving.py:459-464)."""
    err = np.mean(np.linalg.norm(us - us_ref, axis=-1))
    return err / np.mean(np.linalg.norm(us_ref, axis=-1))
