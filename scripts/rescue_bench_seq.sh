#!/bin/bash
# sequential rescue_f128 TPU bench escalation; one process at a time
for n in 18 20 22; do
  echo "=== rescue_f128 log2=$n start $(date +%H:%M:%S) ===" >> /root/repo/.tpu_logs/rescue_session.log
  t0=$SECONDS
  BENCH_WORKLOAD=rescue_f128 BENCH_TRACE_LOG2=$n timeout 7200 python /root/repo/bench.py \
      > /root/repo/.tpu_logs/rescue_$n.json 2> /root/repo/.tpu_logs/rescue_$n.err
  rc=$?
  echo "wall_seconds=$((SECONDS-t0)) rc=$rc size=$n" >> /root/repo/.tpu_logs/rescue_session.log
  [ $rc -ne 0 ] && { echo "size $n failed; stop" >> /root/repo/.tpu_logs/rescue_session.log; break; }
done
echo "=== rescue session done $(date +%H:%M:%S) ===" >> /root/repo/.tpu_logs/rescue_session.log
