#!/bin/bash
# Round-4 TPU chain #3: after chain2 — the headline rescue chain 2^14
# (trace 2^18) with all round-4 fixes, then larger chain points.
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

if [ -n "${CUTOFF_EPOCH:-}" ]; then
  CUTOFF=$CUTOFF_EPOCH
else
  CUTOFF=$(( $(date +%s) + ${CUTOFF_BUDGET_S:-18000} ))
fi

for i in $(seq 1 720); do
  grep -q "chain2 done" "$LOG/r4_chain2.log" 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; maxt=$2; shift 2
  NOW=$(date +%s); LEFT=$(( CUTOFF - NOW ))
  [ "$LEFT" -gt "$maxt" ] || maxt=$LEFT
  if [ "$maxt" -lt 300 ]; then
    echo "=== $name SKIPPED (cutoff) ===" | tee -a "$LOG/r4_chain3.log"
    return
  fi
  echo "=== $name start $(date +%T) (max ${maxt}s) ===" | tee -a "$LOG/r4_chain3.log"
  T0=$(date +%s)
  timeout "$maxt" "$@" > "$LOG/r4_$name.out" 2> "$LOG/r4_$name.err"
  echo "=== $name rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r4_chain3.log"
}

# rescue18 = chain 2^14, the reference's headline row (0.6 s baseline);
# run twice: first compiles the new fused programs, second is the warm number
run rescue18 5400 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=18 python bench.py
run rescue18w 1800 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=18 python bench.py
run rescue14b 1800 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=14 python bench.py
echo "=== chain3 done $(date +%T) ===" | tee -a "$LOG/r4_chain3.log"
