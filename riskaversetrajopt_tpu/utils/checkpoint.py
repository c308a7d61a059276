"""SCP checkpoint/resume.

The reference checkpoints only final results per (alpha, repeat)
(`results/*.npy`, car/driving.py:516-529) and resumes downstream stages from
those files. For elasticity the framework additionally checkpoints MID-SOLVE
SCP state — the control iterate plus the ADMM warm-start vectors — so an
interrupted sweep resumes at the iteration where it stopped
(SURVEY.md section 5 'Checkpoint / resume')."""

from __future__ import annotations

import pathlib
from typing import NamedTuple, Optional

import numpy as np


class SCPCheckpoint(NamedTuple):
    scp_iter: int
    us: np.ndarray  # (S, n_u) current control iterate
    warm_x: np.ndarray  # (nv,) ADMM primal warm start
    warm_y: np.ndarray  # (rows,) ADMM dual warm start
    warm_rho: Optional[float] = None  # adapted ADMM rho (None in old files)


def save(path, scp_iter: int, us, warm_x, warm_y, warm_rho=None):
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp.npz")
    arrays = dict(
        scp_iter=np.asarray(scp_iter),
        us=np.asarray(us),
        warm_x=np.asarray(warm_x),
        warm_y=np.asarray(warm_y),
    )
    if warm_rho is not None:
        arrays["warm_rho"] = np.asarray(warm_rho)
    np.savez(tmp, **arrays)
    tmp.rename(path)  # atomic on POSIX


def load(path) -> Optional[SCPCheckpoint]:
    path = pathlib.Path(path)
    if not path.exists():
        return None
    with np.load(path) as z:
        return SCPCheckpoint(
            scp_iter=int(z["scp_iter"]),
            us=z["us"],
            warm_x=z["warm_x"],
            warm_y=z["warm_y"],
            warm_rho=(float(z["warm_rho"]) if "warm_rho" in z else None),
        )
