#!/bin/bash
# Round-4 TPU chain #7: re-capture the seed after reverting the Pallas
# floor (the original fib resident executable is already cached, so this
# is warm: one rehearsal + one capture run).
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

for i in $(seq 1 720); do
  grep -q "chain6 done" "$LOG/r4_chain6.log" 2>/dev/null && break
  sleep 10
done

echo "=== warmrehearsal2 start $(date +%T) ===" | tee -a "$LOG/r4_chain7.log"
T0=$(date +%s)
timeout 1800 python bench.py > "$LOG/r4_fibwarm_rehearsal2.out" 2> "$LOG/r4_fibwarm_rehearsal2.err"
echo "=== warmrehearsal2 rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r4_chain7.log"

echo "=== seedcapture2 start $(date +%T) ===" | tee -a "$LOG/r4_chain7.log"
T0=$(date +%s)
rm -rf .jax_cache_seed_new
SEED_DIR=.jax_cache_seed_new timeout 2400 bash scripts/capture_seed.sh \
    > "$LOG/r4_seedcap2.out" 2> "$LOG/r4_seedcap2.err"
RC=$?
N_NEW=$(ls .jax_cache_seed_new 2>/dev/null | wc -l)
if [ "$RC" -eq 0 ] && [ "$N_NEW" -gt 0 ]; then
  rm -f .jax_cache_seed/*-cache
  mv .jax_cache_seed_new/* .jax_cache_seed/
  rmdir .jax_cache_seed_new
  echo "=== seedcapture2 OK files=$N_NEW wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r4_chain7.log"
else
  echo "=== seedcapture2 FAILED rc=$RC files=$N_NEW (previous seed kept) ===" | tee -a "$LOG/r4_chain7.log"
fi
echo "=== chain7 done $(date +%T) ===" | tee -a "$LOG/r4_chain7.log"
