#!/bin/bash
# Round-4 TPU chain #6: driver-bench rehearsal + compile-cache seed capture.
# Compiles the (post-pallas-floor) resident fib program, times the WHOLE
# warm default-bench process (what the driver pays), then captures the
# exact executable set into a fresh .jax_cache_seed — swapping it in only
# if the capture produced files (never leaves an empty seed).
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

for i in $(seq 1 2160); do
  grep -q "chain5 done" "$LOG/r4_chain5.log" 2>/dev/null && break
  sleep 10
done

echo "=== fibcold start $(date +%T) ===" | tee -a "$LOG/r4_chain6.log"
T0=$(date +%s)
timeout 4200 python bench.py > "$LOG/r4_fibcold.out" 2> "$LOG/r4_fibcold.err"
echo "=== fibcold rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r4_chain6.log"

echo "=== warmrehearsal start $(date +%T) ===" | tee -a "$LOG/r4_chain6.log"
T0=$(date +%s)
timeout 1800 python bench.py > "$LOG/r4_fibwarm_rehearsal.out" 2> "$LOG/r4_fibwarm_rehearsal.err"
echo "=== warmrehearsal rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r4_chain6.log"

echo "=== seedcapture start $(date +%T) ===" | tee -a "$LOG/r4_chain6.log"
T0=$(date +%s)
rm -rf .jax_cache_seed_new
SEED_DIR=.jax_cache_seed_new timeout 2400 bash scripts/capture_seed.sh \
    > "$LOG/r4_seedcap.out" 2> "$LOG/r4_seedcap.err"
RC=$?
N_NEW=$(ls .jax_cache_seed_new 2>/dev/null | wc -l)
if [ "$RC" -eq 0 ] && [ "$N_NEW" -gt 0 ]; then
  rm -f .jax_cache_seed/*-cache
  mv .jax_cache_seed_new/* .jax_cache_seed/
  rmdir .jax_cache_seed_new
  echo "=== seedcapture OK files=$N_NEW wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r4_chain6.log"
else
  echo "=== seedcapture FAILED rc=$RC files=$N_NEW (old seed kept) ===" | tee -a "$LOG/r4_chain6.log"
fi
echo "=== chain6 done $(date +%T) ===" | tee -a "$LOG/r4_chain6.log"
