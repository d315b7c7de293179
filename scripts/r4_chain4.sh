#!/bin/bash
# Round-4 TPU chain #4: fused-FRI (device-coin) A/B on the two headline
# workloads, then the amortized rescue chain 2^16 point (trace 2^20).
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

if [ -n "${CUTOFF_EPOCH:-}" ]; then
  CUTOFF=$CUTOFF_EPOCH
else
  CUTOFF=$(( $(date +%s) + ${CUTOFF_BUDGET_S:-21600} ))
fi

run() {
  name=$1; maxt=$2; shift 2
  NOW=$(date +%s); LEFT=$(( CUTOFF - NOW ))
  [ "$LEFT" -gt "$maxt" ] || maxt=$LEFT
  if [ "$maxt" -lt 300 ]; then
    echo "=== $name SKIPPED (cutoff) ===" | tee -a "$LOG/r4_chain4.log"
    return
  fi
  echo "=== $name start $(date +%T) (max ${maxt}s) ===" | tee -a "$LOG/r4_chain4.log"
  T0=$(date +%s)
  timeout "$maxt" "$@" > "$LOG/r4_$name.out" 2> "$LOG/r4_$name.err"
  echo "=== $name rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r4_chain4.log"
}

# fused-FRI cold compile + warm A/B: rescue chain 2^14 (vs 1.211 s per-layer)
run rescue18f 5400 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=18 python bench.py
run rescue18fw 1800 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=18 python bench.py
# fib f64 2^18 (vs 4.302 s per-layer)
run fib18f 5400 env BENCH_TRACE_LOG2=18 python bench.py
run fib18fw 1800 env BENCH_TRACE_LOG2=18 python bench.py
# amortized chain point: rescue chain 2^16 = trace 2^20 (ref 2.5 s)
run rescue20f 7200 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=20 python bench.py
run rescue20fw 2400 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=20 python bench.py
echo "=== chain4 done $(date +%T) ===" | tee -a "$LOG/r4_chain4.log"
