"""Multi-process distributed backend test (SURVEY.md section 4): a simulated
2-host CPU pod (2 processes x 4 virtual devices, gloo collectives) solves the
sample-sharded structured SAA QP; both processes must agree with each other
AND with the single-process solve in this process. (The full-SCP pod solve is
available via RATO_DIST_FULL=1 on the selftest module — it compiles the whole
SCP scan in every worker and is too slow for CI.)"""

import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riskaversetrajopt_tpu.core.config import SolverConfig
from riskaversetrajopt_tpu.ops.saa_qp import solve_saa_qp
from riskaversetrajopt_tpu.parallel.distributed import selftest_problem


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pod_matches_single_process(tmp_path):
    port = _free_port()
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = "/root/repo" + os.pathsep + env_base.get(
        "PYTHONPATH", ""
    )
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m",
                    "riskaversetrajopt_tpu.parallel.distributed",
                    "--selftest", "--coordinator", f"localhost:{port}",
                    "--num-processes", "2", "--process-id", str(pid),
                ],
                env=env_base,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    sums = []
    for out in outs:
        m = re.search(r"SELFTEST_OK .*ndev=(\d+) us_sum=([-\d.e+]+)", out)
        assert m, f"no SELFTEST_OK in output:\n{out[-3000:]}"
        assert m.group(1) == "8"
        sums.append(float(m.group(2)))
    assert sums[0] == sums[1], "processes disagree on the sharded solution"

    # single-process ground truth on the identical synthetic problem
    st, data = selftest_problem(16)
    data = jax.tree.map(jnp.asarray, data)
    cfg = SolverConfig(eps_abs=1e-8, eps_rel=1e-8, max_iter=8000)
    sol = solve_saa_qp(st, data, jnp.asarray(3), cfg)
    assert bool(sol.solved)
    np.testing.assert_allclose(
        sums[0], float(np.sum(np.asarray(sol.x))), rtol=1e-6
    )
