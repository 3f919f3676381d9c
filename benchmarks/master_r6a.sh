#!/bin/bash
# r6a: the cell-size sweep r5c queued but ran from the wrong cwd
# (benchmarks/ has no bench.py).  Sequential; each leg is a full
# engine bench at 1M through the public knobs.
LOG=/root/repo/benchmarks/master_r6a.log
cd /root/repo

run_one () {
  local tag=$1; shift
  local out=/root/repo/benchmarks/sweep_r5cell_$tag.out
  if [ -f "$out" ] && grep -q pairs_per_sec "$out"; then
    echo "[r6a] sweep $tag already done" | tee -a $LOG; return 0
  fi
  echo "[r6a] sweep $tag start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 2400 env "$@" python bench.py > "$out" 2>&1)
  tail -1 "$out" | tee -a $LOG
}
run_one c050_p4   BENCH_CELLF=0.5  BENCH_PACK=4  BENCH_LB=1
run_one c050_p8   BENCH_CELLF=0.5  BENCH_PACK=8  BENCH_LB=1
run_one c060_p4   BENCH_CELLF=0.6  BENCH_PACK=4  BENCH_LB=1
run_one c075_p8   BENCH_CELLF=0.75 BENCH_PACK=8  BENCH_LB=1
run_one c125_p16  BENCH_CELLF=1.25 BENCH_PACK=16 BENCH_LB=1
echo "[r6a] ALL DONE" | tee -a $LOG
