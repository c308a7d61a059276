"""Shared experiment-harness utilities: results persistence (reference
`.npy` sequential-save format, car/driving.py:516-529), figure output, and
batched sweep helpers."""

from __future__ import annotations

import pathlib

import numpy as np


def results_dir(base: str = "results") -> pathlib.Path:
    p = pathlib.Path(base)
    p.mkdir(parents=True, exist_ok=True)
    return p


def figures_dir(base: str = "figures") -> pathlib.Path:
    p = pathlib.Path(base)
    p.mkdir(parents=True, exist_ok=True)
    return p


def save_traj(path, us, xs):
    """Sequential np.save of (us, xs) — the reference's cross-script data
    contract (car/driving.py:516-521)."""
    with open(path, "wb") as f:
        np.save(f, np.asarray(us))
        np.save(f, np.asarray(xs))


def load_traj(path):
    with open(path, "rb") as f:
        us = np.load(f)
        xs = np.load(f)
    return us, xs


def save_timing(path, alphas, define_t, solve_t, cum_t, l2):
    """results/driving_computation_times.npy format
    (car/driving.py:523-529)."""
    with open(path, "wb") as f:
        np.save(f, np.asarray(alphas))
        np.save(f, np.asarray(define_t))
        np.save(f, np.asarray(solve_t))
        np.save(f, np.asarray(cum_t))
        np.save(f, np.asarray(l2))


def load_timing(path):
    with open(path, "rb") as f:
        return tuple(np.load(f) for _ in range(5))


def setup_matplotlib():
    """Headless-safe matplotlib (figures are saved, not shown — the only
    intentional deviation from the reference's plt.show() windows)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt
