#!/bin/bash
# r7a: brick-tile A/B re-run AFTER the v6 fixes (per-tile-max wcap tune,
# padding-tile skip) that landed in a90dfa2 without a hardware re-run.
# Row baseline: bench_headline_r5b.out (113.2 ms).  Sequential legs; each
# is a full engine bench at 1M through public knobs.  Completion sentinel:
# the literal line "[r7a] ALL DONE" in this log.
LOG=/root/repo/benchmarks/master_r7a.log
cd /root/repo

run_one () {
  local tag=$1; shift
  local out=/root/repo/benchmarks/bench_$tag.out
  if [ -f "$out" ] && grep -q pairs_per_sec "$out"; then
    echo "[r7a] $tag already done" | tee -a $LOG; return 0
  fi
  echo "[r7a] $tag start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 2400 env BENCH_VERBOSE=1 "$@" python bench.py > "$out" 2>&1)
  tail -1 "$out" | tee -a $LOG
}
run_one r7_row_base                                  # row-tile sanity (cached)
run_one r7_b223_p8  BENCH_BRICK=2,2,3 BENCH_PACK=8  BENCH_LB=1
run_one r7_b223_p4  BENCH_BRICK=2,2,3 BENCH_PACK=4  BENCH_LB=1
run_one r7_b222_p8  BENCH_BRICK=2,2,2 BENCH_PACK=8  BENCH_LB=1
run_one r7_b233_p8  BENCH_BRICK=2,3,3 BENCH_PACK=8  BENCH_LB=1
run_one r7_b223_p16 BENCH_BRICK=2,2,3 BENCH_PACK=16 BENCH_LB=1
echo "[r7a] ALL DONE" | tee -a $LOG
