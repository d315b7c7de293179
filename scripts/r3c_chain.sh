#!/bin/bash
# Round-3 (session c) TPU chain, relaunched after the session restart killed
# r3b at step 2:
# 1) warm driver rehearsal: fresh .jax_cache hydrated from the COMMITTED seed
#    (exactly the round-end driver scenario that rc=124'd in round 2),
# 2) restore the fuller runtime cache (f128 executables etc.),
# 3) the f128 headline bench (rescue chain 2^14, ref 0.6 s),
# 4) decision probes (lane-layout A/B, u32-lane f128 A/B).
set -u
cd /root/repo
LOG=.tpu_logs
export PALLAS_AXON_REMOTE_COMPILE=1

run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a "$LOG/r3c_chain.log"
  T0=$(date +%s)
  timeout 5400 "$@" > "$LOG/r3c_$name.out" 2> "$LOG/r3c_$name.err"
  echo "=== $name rc=$? wall=$(( $(date +%s) - T0 ))s ===" | tee -a "$LOG/r3c_chain.log"
}

# 1. warm rehearsal against ONLY the committed seed
[ -d .jax_cache_full ] || mv .jax_cache .jax_cache_full
run warm python bench.py

# 2. merge the fuller cache back (hardlink entries the seed lacks)
python - <<'EOF'
import os
src, dst = ".jax_cache_full", ".jax_cache"
os.makedirs(dst, exist_ok=True)
n = 0
for f in os.listdir(src):
    s, d = os.path.join(src, f), os.path.join(dst, f)
    if os.path.isfile(s) and not os.path.exists(d):
        os.link(s, d); n += 1
print(f"restored {n} runtime-cache entries")
EOF

# 3. f128 headline workload
run rescue18 env BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=18 python bench.py

# 4. probes
run layout env AB_N=$((1<<21)) python scripts/f64_layout_ab.py
run u32ab env AB_N=$((1<<20)) python scripts/f128_u32_ab.py

echo "=== chain done $(date +%T) ===" | tee -a "$LOG/r3c_chain.log"
