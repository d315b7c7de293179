#!/bin/bash
# Sequential TPU bench session: validates the warm path at 2^18, then scales
# to 2^20 and the 2^22 flagship. One process at a time touches the TPU.
# Usage: scripts/tpu_session.sh [logdir]
set -u
LOG=${1:-/root/repo/.tpu_logs}
mkdir -p "$LOG"
cd /root/repo
export PALLAS_AXON_REMOTE_COMPILE=1
export WINTER_LOG=info

for SZ in 18 20 22; do
  echo "=== BENCH_TRACE_LOG2=$SZ start $(date +%T) ===" | tee -a "$LOG/session.log"
  T0=$(date +%s)
  env BENCH_TRACE_LOG2=$SZ timeout 10800 \
    python bench.py > "$LOG/bench_$SZ.json" 2> "$LOG/bench_$SZ.err"
  RCIN=$?
  echo "wall_seconds=$(( $(date +%s) - T0 ))" | tee -a "$LOG/session.log"
  RC=$RCIN
  echo "=== size $SZ rc=$RC end $(date +%T) ===" | tee -a "$LOG/session.log"
  cat "$LOG/bench_$SZ.json" | tee -a "$LOG/session.log"
  if [ $RC -ne 0 ]; then
    echo "size $SZ failed (rc=$RC); stopping escalation" | tee -a "$LOG/session.log"
    break
  fi
done
echo "=== session done $(date +%T) ===" | tee -a "$LOG/session.log"
