#!/bin/bash
# TPU probe batch for the Pallas fused-ADMM kernel envelope.
# One process per probe (a device fault wedges the chip ~2-4 min; isolation
# keeps one failure from poisoning the rest). Waits between probes to let a
# wedged chip recover.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
probes=(
  "chunk 1000 32 100"
  "chunk 1000 16 100"
  "solve 1000 32 100 4000"
  "embedded 512 32 100 4000"
  "embedded 1000 32 100 4000"
)
for p in "${probes[@]}"; do
  echo "=== PROBE: $p ($(date +%H:%M:%S)) ==="
  timeout 1200 python -u tools/probe_pallas.py $p 2>&1 | tail -20
  code=$?
  echo "=== exit $code ==="
  if [ $code -ne 0 ]; then
    echo "(sleeping 180s for possible device recovery)"
    sleep 180
  fi
done
echo "BATCH DONE"
