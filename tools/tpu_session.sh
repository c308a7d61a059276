#!/bin/bash
# Hardware session: run when the TPU tunnel is back.
#   setsid nohup bash tools/tpu_session.sh > /tmp/tpu_session.log 2>&1 &
# Sequential (one chip): component profile, solver-knob A/B, full bench.
set -x
cd "$(dirname "$0")/.."
python -u -c "import jax; print(jax.devices())" || exit 1
python -u tools/profile_scp.py 2>&1 | tee /tmp/prof_tpu.log
python -u tools/ab_bench.py 2>&1 | tee /tmp/ab_tpu.log
python -u bench.py 2>&1 | tee /tmp/bench_tpu.log
echo "=== tpu session done ==="
