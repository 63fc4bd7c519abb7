#!/bin/bash
# Run every acceptance script (truncated epochs for the training ones).
# Usage: scripts/run_examples.sh [cpu|tpu]
cd "$(dirname "$0")/.."
MODE=${1:-cpu}
if [ "$MODE" = "cpu" ]; then
  RUN=(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu)
else
  RUN=(env)
fi
FAIL=0
for s in examples/t4_*.4th; do
  start=$(date +%s)
  if "${RUN[@]}" T4_MAX_BATCH=2 T4_SEED=42 PYTHONPATH="$PWD:$PYTHONPATH" \
      timeout 900 python -c "from tensorforth_tpu.cli import main; main([])" \
      < "$s" > "/tmp/$(basename "$s").out" 2>&1; then
    echo "PASS $s ($(( $(date +%s) - start ))s)"
  else
    echo "FAIL $s"; FAIL=1
  fi
done
exit $FAIL
