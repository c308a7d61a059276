#!/bin/bash
# Drive the pallas-driver bisect ladder, one case per process, with chip
# recovery waits after faults. Usage:
#   setsid nohup bash tools/bisect_pallas_driver.sh > /tmp/bisect_pallas.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

wait_for_chip() {
  for i in $(seq 1 12); do
    if timeout 120 python -c "import jax; jax.numpy.zeros(8).block_until_ready(); print('chip ok')" 2>/dev/null | grep -q "chip ok"; then
      return 0
    fi
    sleep 30
  done
  echo "CHIP_UNAVAILABLE"
  return 1
}

for case in "$@"; do
  wait_for_chip || exit 1
  timeout 1500 python -u tools/bisect_pallas_driver.py "$case" 1000
  echo "=== case $case rc=$? ==="
  sleep 10
done
echo "=== bisect ladder done ==="
