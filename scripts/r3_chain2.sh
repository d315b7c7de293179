#!/bin/bash
# Round-3 TPU chain #2: scaling benches after the chain-1 probes.
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1
export WINTER_LOG=info

run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a "$LOG/r3_chain2.log"
  T0=$(date +%s)
  timeout 7200 "$@" > "$LOG/r3_$name.out" 2> "$LOG/r3_$name.err"
  echo "=== $name rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r3_chain2.log"
  grep -h "metric" "$LOG/r3_$name.out" 2>/dev/null | tee -a "$LOG/r3_chain2.log"
}

# rescue_f128 scaling: chain 2^15 (trace 2^19) and 2^16 (trace 2^20 — the
# round-2 OOM point, fix unvalidated on TPU)
run rescue19 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=19 python bench.py
run rescue20 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=20 python bench.py

# fib 2^22 flagship with the async query assembly
run fib22 env BENCH_TRACE_LOG2=22 python bench.py

echo "=== chain2 done $(date +%T) ===" | tee -a "$LOG/r3_chain2.log"
