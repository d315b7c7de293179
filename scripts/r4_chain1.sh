#!/bin/bash
# Round-4 TPU chain #1: runs after the current TPU job frees the chip.
#   1. pallas_loop_exp — fori-loop Rescue kernel A/B (size + speed data)
#   2. rescue_f128 2^14 warm — measures the tree-prefetch query-phase fix
#   3. rescue_f128 2^16 — first amortization data point
# Each job under its own timeout; CUTOFF via env (relative budget default 4h).
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

if [ -n "${CUTOFF_EPOCH:-}" ]; then
  CUTOFF=$CUTOFF_EPOCH
else
  CUTOFF=$(( $(date +%s) + ${CUTOFF_BUDGET_S:-14400} ))
fi

# wait (max 60 min) for the running TPU process to exit
for i in $(seq 1 360); do
  pgrep -f "python bench.py" > /dev/null 2>&1 || break
  sleep 10
done

run() {
  name=$1; maxt=$2; shift 2
  NOW=$(date +%s); LEFT=$(( CUTOFF - NOW ))
  [ "$LEFT" -gt "$maxt" ] || maxt=$LEFT
  if [ "$maxt" -lt 300 ]; then
    echo "=== $name SKIPPED (cutoff) ===" | tee -a "$LOG/r4_chain1.log"
    return
  fi
  echo "=== $name start $(date +%T) (max ${maxt}s) ===" | tee -a "$LOG/r4_chain1.log"
  T0=$(date +%s)
  timeout "$maxt" "$@" > "$LOG/r4_$name.out" 2> "$LOG/r4_$name.err"
  echo "=== $name rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r4_chain1.log"
}

run loopexp 3600 python scripts/pallas_loop_exp.py
run rescue14 3600 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=14 python bench.py
run rescue16 5400 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=16 python bench.py
echo "=== chain1 done $(date +%T) ===" | tee -a "$LOG/r4_chain1.log"
