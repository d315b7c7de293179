#!/bin/bash
# Run one TPU bench at a given size, logging to .tpu_logs/bench_<size>.{json,err}
set -u
SZ=${1:?size}
LOG=/root/repo/.tpu_logs
mkdir -p "$LOG"
cd /root/repo
export PALLAS_AXON_REMOTE_COMPILE=1
export WINTER_LOG=info
echo "=== BENCH_TRACE_LOG2=$SZ start $(date +%T) ===" | tee -a "$LOG/session.log"
T0=$(date +%s)
env BENCH_TRACE_LOG2=$SZ timeout 10800 \
  python bench.py > "$LOG/bench_$SZ.json" 2> "$LOG/bench_$SZ.err"
RC=$?
echo "wall_seconds=$(( $(date +%s) - T0 )) rc=$RC size=$SZ" | tee -a "$LOG/session.log"
cat "$LOG/bench_$SZ.json" | tee -a "$LOG/session.log"
