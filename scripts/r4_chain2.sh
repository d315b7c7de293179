#!/bin/bash
# Round-4 TPU chain #2: after chain1 — retry the patched fori-loop Rescue
# A/B, then an uncontended warm fib18 wall measurement.
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

if [ -n "${CUTOFF_EPOCH:-}" ]; then
  CUTOFF=$CUTOFF_EPOCH
else
  CUTOFF=$(( $(date +%s) + ${CUTOFF_BUDGET_S:-14400} ))
fi

for i in $(seq 1 720); do
  grep -q "chain1 done" "$LOG/r4_chain1.log" 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; maxt=$2; shift 2
  NOW=$(date +%s); LEFT=$(( CUTOFF - NOW ))
  [ "$LEFT" -gt "$maxt" ] || maxt=$LEFT
  if [ "$maxt" -lt 300 ]; then
    echo "=== $name SKIPPED (cutoff) ===" | tee -a "$LOG/r4_chain2.log"
    return
  fi
  echo "=== $name start $(date +%T) (max ${maxt}s) ===" | tee -a "$LOG/r4_chain2.log"
  T0=$(date +%s)
  timeout "$maxt" "$@" > "$LOG/r4_$name.out" 2> "$LOG/r4_$name.err"
  echo "=== $name rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r4_chain2.log"
}

run loopexp2 3600 python scripts/pallas_loop_exp.py
run fib18b 3000 env BENCH_TRACE_LOG2=18 python bench.py
echo "=== chain2 done $(date +%T) ===" | tee -a "$LOG/r4_chain2.log"
