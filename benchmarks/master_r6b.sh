#!/bin/bash
# r6b: brick-tile layout A/B at 1M (v6 kernel geometry).  Row baseline is
# bench_headline_r5b.out (113.2 ms).  Each leg auto-tunes wcap from the
# brick window histogram; pre caps auto-regrow.
LOG=/root/repo/benchmarks/master_r6b.log
cd /root/repo

run_one () {
  local tag=$1; shift
  local out=/root/repo/benchmarks/bench_$tag.out
  if [ -f "$out" ] && grep -q pairs_per_sec "$out"; then
    echo "[r6b] $tag already done" | tee -a $LOG; return 0
  fi
  echo "[r6b] $tag start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 2400 env BENCH_VERBOSE=1 "$@" python bench.py > "$out" 2>&1)
  tail -1 "$out" | tee -a $LOG
}
run_one r6_b223_p8  BENCH_BRICK=2,2,3 BENCH_PACK=8  BENCH_LB=1
run_one r6_b223_p4  BENCH_BRICK=2,2,3 BENCH_PACK=4  BENCH_LB=1
run_one r6_b222_p8  BENCH_BRICK=2,2,2 BENCH_PACK=8  BENCH_LB=1
run_one r6_b233_p8  BENCH_BRICK=2,3,3 BENCH_PACK=8  BENCH_LB=1
run_one r6_b223_p16 BENCH_BRICK=2,2,3 BENCH_PACK=16 BENCH_LB=1
echo "[r6b] ALL DONE" | tee -a $LOG
