#!/bin/bash
# Round-3 TPU experiment chain #1: runs after the cold 2^20 bench frees the
# chip. Seed capture first (protects the driver bench), then profiles.
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a "$LOG/r3_chain1.log"
  T0=$(date +%s)
  timeout 5400 "$@" > "$LOG/r3_$name.out" 2> "$LOG/r3_$name.err"
  echo "=== $name rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r3_chain1.log"
}

# 1. seed capture: one warm default bench, parse cache keys, copy to seed dir
run seed bash scripts/capture_seed.sh

# 2. per-kernel profiles
run prof_fib env PROF_LOG2=20 python scripts/profile_prove.py
run prof_rescue env PROF_CHAIN_LOG2=14 python scripts/profile_rescue.py

# 3. targeted probes
run deep_probe env PROBE_LOG2=18 python scripts/f128_deep_probe.py
run micro python scripts/micro_tpu.py
run u32_ab env AB_N=$((1<<20)) AB_R=10 python scripts/f128_u32_ab.py

# 4. post-change benches (async queries + upload cache + phi fold)
run bench18 env BENCH_TRACE_LOG2=18 python bench.py
run rescue18 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=18 python bench.py

echo "=== chain1 done $(date +%T) ===" | tee -a "$LOG/r3_chain1.log"
