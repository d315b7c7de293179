#!/bin/bash
# Round-4 TPU chain #5: resident-prove A/B on the rescue headline, the
# small-chain sweep (dispatch-overhead sizes), and the Lamport bench.
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

if [ -n "${CUTOFF_EPOCH:-}" ]; then
  CUTOFF=$CUTOFF_EPOCH
else
  CUTOFF=$(( $(date +%s) + ${CUTOFF_BUDGET_S:-21600} ))
fi

for i in $(seq 1 1080); do
  grep -q "chain4 done" "$LOG/r4_chain4.log" 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; maxt=$2; shift 2
  NOW=$(date +%s); LEFT=$(( CUTOFF - NOW ))
  [ "$LEFT" -gt "$maxt" ] || maxt=$LEFT
  if [ "$maxt" -lt 300 ]; then
    echo "=== $name SKIPPED (cutoff) ===" | tee -a "$LOG/r4_chain5.log"
    return
  fi
  echo "=== $name start $(date +%T) (max ${maxt}s) ===" | tee -a "$LOG/r4_chain5.log"
  T0=$(date +%s)
  timeout "$maxt" "$@" > "$LOG/r4_$name.out" 2> "$LOG/r4_$name.err"
  echo "=== $name rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r4_chain5.log"
}

# resident-prove cold + warm on the headline chain 2^14 (vs 1.14 s phased)
run rescue18r 5400 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=18 python bench.py
run rescue18rw 1800 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=18 python bench.py
# small chains: dispatch-bound sizes where the 2-dispatch prove shines
run rescue16r 3600 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=16 python bench.py
run rescue16rw 1200 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=16 python bench.py
run rescue14r 3600 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=14 python bench.py
run rescue14rw 1200 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=14 python bench.py
# Lamport aggregate (reference headline table #2), 256 signatures
run lamport256 7200 env BENCH_WORKLOAD=lamport BENCH_SIGS=256 python bench.py
run lamport256w 2400 env BENCH_WORKLOAD=lamport BENCH_SIGS=256 python bench.py
echo "=== chain5 done $(date +%T) ===" | tee -a "$LOG/r4_chain5.log"
