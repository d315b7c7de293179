#!/bin/bash
# Round-3 (session b) TPU chain #2 — decision probes after the seed commit:
# 1) lane-layout A/B (how much VPU the trailing narrow axes waste),
# 2) u32-lane f128 engine prototype A/B,
# 3) per-kernel rescue profile,
# 4) rescue_f128 2^20 validation (the run that OOMed pre-scan-fixes),
# 5) SMEM fori-loop Rescue A/B.
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a "$LOG/r3b_chain2.log"
  T0=$(date +%s)
  timeout 4500 "$@" > "$LOG/r3b_$name.out" 2> "$LOG/r3b_$name.err"
  echo "=== $name rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r3b_chain2.log"
}

run layout env AB_N=$((1<<21)) python scripts/f64_layout_ab.py
run u32ab env AB_N=$((1<<20)) python scripts/f128_u32_ab.py
run prof_rescue env PROF_CHAIN_LOG2=14 python scripts/profile_rescue.py
run rescue20 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=20 python bench.py
run loop_exp python scripts/pallas_loop_exp.py

echo "=== chain2 done $(date +%T) ===" | tee -a "$LOG/r3b_chain2.log"
