#!/bin/bash
# Round-4 TPU chain #8: refresh the flagship f64 numbers (2^20, 2^22) with
# the round-4 code (gather batch + free-run measurement; commit/FRI
# programs for these sizes are cached from round 3).
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

run() {
  name=$1; maxt=$2; shift 2
  echo "=== $name start $(date +%T) (max ${maxt}s) ===" | tee -a "$LOG/r4_chain8.log"
  T0=$(date +%s)
  timeout "$maxt" "$@" > "$LOG/r4_$name.out" 2> "$LOG/r4_$name.err"
  echo "=== $name rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r4_chain8.log"
}

run fib20 3600 env BENCH_TRACE_LOG2=20 python bench.py
run fib20w 1800 env BENCH_TRACE_LOG2=20 python bench.py
run fib22 5400 env BENCH_TRACE_LOG2=22 python bench.py
echo "=== chain8 done $(date +%T) ===" | tee -a "$LOG/r4_chain8.log"
