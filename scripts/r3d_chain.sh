#!/bin/bash
# Round-3 follow-up chain: waits for r3c_chain, then records larger f128
# rescue points. HARD CUTOFF: every job is killed in time to free the TPU
# before the driver's round-end bench (only one process may use the chip).
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

# Cutoff comes from the caller (absolute epoch seconds or a relative
# budget) instead of a hardcoded local wall-clock time whose fallback
# silently skipped every job (round-3 advisor finding).
if [ -n "${CUTOFF_EPOCH:-}" ]; then
  CUTOFF=$CUTOFF_EPOCH
else
  CUTOFF=$(( $(date +%s) + ${CUTOFF_BUDGET_S:-7200} ))
fi

# wait (max 90 min) for the r3c chain to release the TPU
for i in $(seq 1 540); do
  grep -q "chain done" "$LOG/r3c_chain.log" 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; shift
  NOW=$(date +%s)
  LEFT=$(( CUTOFF - NOW ))
  if [ "$LEFT" -lt 300 ]; then
    echo "=== $name SKIPPED (cutoff) ===" | tee -a "$LOG/r3d_chain.log"
    return
  fi
  echo "=== $name start $(date +%T) (budget ${LEFT}s) ===" | tee -a "$LOG/r3d_chain.log"
  T0=$(date +%s)
  timeout "$LEFT" "$@" > "$LOG/r3d_$name.out" 2> "$LOG/r3d_$name.err"
  echo "=== $name rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r3d_chain.log"
}

run rescue20 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=20 python bench.py
run fib18 env BENCH_TRACE_LOG2=18 python bench.py

echo "=== chain done $(date +%T) ===" | tee -a "$LOG/r3d_chain.log"
