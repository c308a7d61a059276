"""ctypes wrapper for the native dense ADMM QP solver (native/qp_admm.cpp).

Serves as the framework's host-side convex engine (the role OSQP plays in the
reference) and as an independent oracle for the on-chip JAX solvers."""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import NamedTuple, Optional

import numpy as np

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "qp_admm.cpp"
_BUILD_DIR = _REPO_ROOT / "build"
_LIB_PATH = _BUILD_DIR / "libqp_admm.so"

_lib = None


def _build():
    _BUILD_DIR.mkdir(exist_ok=True)
    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            str(_SRC), "-o", str(_LIB_PATH),
        ],
        check=True,
    )


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.qp_admm_solve.restype = ctypes.c_int
    lib.qp_admm_solve.argtypes = [
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return lib


class NativeQPSolution(NamedTuple):
    x: np.ndarray
    y: np.ndarray
    iters: int
    prim_res: float
    dual_res: float
    solved: bool


def solve_qp_native(
    P, q, A, l, u,
    eps_abs: float = 1e-6,
    eps_rel: float = 1e-6,
    max_iter: int = 20000,
    sigma: float = 1e-6,
    rho: float = 0.1,
    alpha_relax: float = 1.6,
    polish: bool = True,
) -> NativeQPSolution:
    lib = _load()
    P = np.ascontiguousarray(P, np.float64)
    q = np.ascontiguousarray(q, np.float64)
    A = np.ascontiguousarray(A, np.float64)
    l = np.ascontiguousarray(l, np.float64)
    u = np.ascontiguousarray(u, np.float64)
    n = q.shape[0]
    m = l.shape[0]
    assert P.shape == (n, n) and A.shape == (m, n) and u.shape == (m,)
    x = np.zeros(n)
    y = np.zeros(m)
    info = np.zeros(3)
    status = lib.qp_admm_solve(
        n, m, P, q, A, l, u, eps_abs, eps_rel, max_iter,
        sigma, rho, alpha_relax, int(polish), x, y, info,
    )
    if status < 0:
        raise RuntimeError("native QP setup failed (KKT not SPD)")
    return NativeQPSolution(
        x=x, y=y, iters=int(info[0]), prim_res=float(info[1]),
        dual_res=float(info[2]), solved=(status == 0),
    )
