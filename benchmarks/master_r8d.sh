#!/bin/bash
# r8d: slice-shift network A/B at 1M pack=8 (probe_r8b priced large
# rolls at ~5.9 ms/stride; _shift_up replaces them with 8-aligned
# slice+pad).  Leg 1 = slice ON (new default), leg 2 = roll control.
# Waits for r8c.  Sentinel: "[r8d] ALL DONE".
LOG=/root/repo/benchmarks/master_r8d.log
cd /root/repo
while ! grep -aq "\[r8c\] ALL DONE" benchmarks/master_r8c.log 2>/dev/null; do
  sleep 60
done
run_leg () {
  local name=$1; shift
  echo "[r8d] $name start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 2400 env BENCH_VERBOSE=1 BENCH_ITERS=10 "$@" \
    python bench.py > benchmarks/bench_r8d_$name.out 2>&1)
  grep -a "ms_per_run" benchmarks/bench_r8d_$name.out | tail -1 | tee -a $LOG
}
run_leg p8slice BENCH_PACK=8 TNS_SHIFT_SLICE=1
run_leg p8roll  BENCH_PACK=8 TNS_SHIFT_SLICE=0
echo "[r8d] ALL DONE" | tee -a $LOG
