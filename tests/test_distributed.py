"""Multi-process distributed backend test (SURVEY.md section 4): a simulated
2-host CPU pod (2 processes x 4 virtual devices, gloo collectives) runs the
sample-sharded SCP solve end-to-end; both processes must agree with each
other AND with the single-process 8-virtual-device solve in this process."""

import os
import re
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from riskaversetrajopt_tpu.core.config import DroneScenario, SCPConfig
from riskaversetrajopt_tpu.models.drone import DroneModel
from riskaversetrajopt_tpu.scp.driver import SAATrajOpt


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

    # single-process ground truth (8 virtual devices in this process)
    model = DroneModel(DroneScenario())
    opt = SAATrajOpt(
        model,
        method="saa",
        scp_cfg=SCPConfig(
            num_iters=6, gate_iters=2, gate_row_scale=1e-7,
            gate_bound_l=-0.1, gate_bound_u=0.1,
        ),
    )
    om = opt.sample(jax.random.PRNGKey(0), M=16)
    res = opt.solve(om, alpha=0.2)
    np.testing.assert_allclose(
        sums[0], float(np.sum(np.asarray(res.us))), rtol=1e-8
    )
