#!/bin/bash
# r8a: wcap-granularity sweep at the cell=1.1r default.  win_hist at 1M
# shows 98.9% of windows <= 192 slots while pack=16 forces wcap to a
# multiple of 128 (=> 256, ~60% utilized).  pack=8 admits wcap=192
# (-25% mask+compaction volume, +50% DMA rows); pack=4 re-checks the r3
# pack optimum under the round-4 lane_batch + rec_expand defaults.
# Sentinel: "[r8a] ALL DONE".
LOG=/root/repo/benchmarks/master_r8a.log
cd /root/repo
run_leg () {  # name, env...
  local name=$1; shift
  echo "[r8a] $name start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 2400 env BENCH_VERBOSE=1 BENCH_ITERS=10 "$@" \
    python bench.py > benchmarks/bench_r8a_$name.out 2>&1)
  grep -a "ms_per_run\|knobs" benchmarks/bench_r8a_$name.out | tail -2 | tee -a $LOG
}
run_leg p8w192 BENCH_PACK=8 BENCH_WCAP=192
run_leg p8w256 BENCH_PACK=8 BENCH_WCAP=256
run_leg p4w192 BENCH_PACK=4 BENCH_WCAP=192
echo "[r8a] ALL DONE" | tee -a $LOG
