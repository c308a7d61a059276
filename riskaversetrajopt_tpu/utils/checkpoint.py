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


def save(path, scp_iter: int, us, warm_x, warm_y):
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp.npz")
    np.savez(
        tmp,
        scp_iter=np.asarray(scp_iter),
        us=np.asarray(us),
        warm_x=np.asarray(warm_x),
        warm_y=np.asarray(warm_y),
    )
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
        )
