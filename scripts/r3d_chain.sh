#!/bin/bash
# Round-3 (session c) follow-up chain: waits for r3c_chain to finish, then
# records the larger f128 rescue points (the reference's own headline table)
# now that chain 2^14 hit 1.34 s, plus a fib 2^18 recheck against the 3x bar.
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

# wait (max 90 min) for the r3c chain to release the TPU
for i in $(seq 1 540); do
  grep -q "chain done" "$LOG/r3c_chain.log" 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a "$LOG/r3d_chain.log"
  T0=$(date +%s)
  timeout 5400 "$@" > "$LOG/r3d_$name.out" 2> "$LOG/r3d_$name.err"
  echo "=== $name rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r3d_chain.log"
}

run rescue20 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=20 python bench.py
run fib18 env BENCH_TRACE_LOG2=18 python bench.py

echo "=== chain done $(date +%T) ===" | tee -a "$LOG/r3d_chain.log"
