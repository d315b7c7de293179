#!/bin/bash
# Round-3 (session b) TPU chain: seed capture first (protects the driver
# bench from another rc=124 cold-compile timeout), then a warm driver-
# scenario rehearsal, then the f128 headline bench.
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a "$LOG/r3b_chain.log"
  T0=$(date +%s)
  timeout 7200 "$@" > "$LOG/r3b_$name.out" 2> "$LOG/r3b_$name.err"
  echo "=== $name rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r3b_chain.log"
}

# 1. cold default bench (2^20 fib) + capture used cache keys into the seed
run seed bash scripts/capture_seed.sh

# 2. warm rehearsal of exactly what the driver runs at round end
run warm python bench.py

# 3. the f128 headline workload (chain 2^14, ref 0.6 s)
run rescue18 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=18 python bench.py

echo "=== chain done $(date +%T) ===" | tee -a "$LOG/r3b_chain.log"
