#!/bin/bash
# r9c: round-5 lever legs at the p8c115 headline. Waits for r9b.
#   1. reuse=1: temporal-coherence step (carry skips sort/table/layout)
#   2. table=0: scatter-add dense-table control (sort-build is default)
#   3. jiggle: moving-points regime at the new default (bench_jiggle)
LOG=/root/repo/benchmarks/master_r9c.log
cd /root/repo
while ! grep -aq "\[r9b\] ALL DONE" benchmarks/master_r9b.log 2>/dev/null; do
  sleep 60
done
run_leg () {
  local name=$1; shift
  echo "[r9c] $name start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 3000 env "$@" python bench.py > benchmarks/bench_r9c_$name.out 2>&1)
  grep -a "ms_per_run" benchmarks/bench_r9c_$name.out | tail -1 | tee -a $LOG
}
run_leg reuse BENCH_VERBOSE=1 BENCH_REUSE=1
run_leg tablescatter BENCH_VERBOSE=1 TNS_TABLE_SORT=0
run_leg tablesort BENCH_VERBOSE=1
echo "[r9c] jiggle start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 3000 python benchmarks/bench_jiggle.py > benchmarks/bench_jiggle_r9c.out 2>&1)
tail -2 benchmarks/bench_jiggle_r9c.out | tee -a $LOG
echo "[r9c] ALL DONE" | tee -a $LOG
