#!/bin/bash
# r7c: hardware A/B of the round-4 first batch — v2 single-plane packed
# compaction, NaN-validity + sentinel-orig masks, pp de-gather, tiles_cap
# snug.  Baseline: bench_r7_row_base.out (109.37 ms).  Sentinel:
# "[r7c] ALL DONE".
LOG=/root/repo/benchmarks/master_r7c.log
cd /root/repo

run_one () {
  local tag=$1; shift
  local out=/root/repo/benchmarks/bench_$tag.out
  echo "[r7c] $tag start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 2400 env BENCH_VERBOSE=1 "$@" python bench.py > "$out" 2>&1)
  tail -1 "$out" | tee -a $LOG
}
run_one r7c_row_v2
echo "[r7c] probe_r7a rerun $(date +%H:%M:%S)" | tee -a $LOG
timeout 3000 python benchmarks/probe_r7a.py > benchmarks/probe_r7c.out 2>&1
tail -16 benchmarks/probe_r7c.out | tee -a $LOG
echo "[r7c] ALL DONE" | tee -a $LOG
