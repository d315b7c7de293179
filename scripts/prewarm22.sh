#!/bin/bash
# Wait for any in-flight bench.py to release the TPU, then prewarm/record
# the flagship fib 2^22 bench (cold .jax_cache after a round reset).
cd /root/repo
for i in $(seq 1 300); do
  pgrep -f "python bench.py" >/dev/null || break
  sleep 10
done
echo "=== prewarm fib 22 start $(date +%H:%M:%S) ===" >> .tpu_logs/session.log
t0=$SECONDS
BENCH_TRACE_LOG2=22 timeout 7200 python bench.py \
    > .tpu_logs/bench_22_r2.json 2> .tpu_logs/bench_22_r2.err
rc=$?
echo "wall_seconds=$((SECONDS-t0)) rc=$rc size=22 (r2 prewarm)" >> .tpu_logs/session.log
