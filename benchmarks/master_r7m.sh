#!/bin/bash
# r7m: refine the cell optimum around 1.1r (85.7 ms), then validate the
# winner end-to-end at 1M.  Sentinel: "[r7m] ALL DONE".
LOG=/root/repo/benchmarks/master_r7m.log
cd /root/repo
run_one () {
  local tag=$1; shift
  local out=/root/repo/benchmarks/bench_$tag.out
  echo "[r7m] $tag start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 2400 env "$@" python bench.py > "$out" 2>&1)
  tail -1 "$out" | tee -a $LOG
}
run_one r7m_c115 BENCH_CELLF=1.15
run_one r7m_c105 BENCH_CELLF=1.05
echo "[r7m] validate c1.1 start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 3000 env BENCH_CELLF=1.1 python benchmarks/validate_1m.py \
  > benchmarks/validate_1m_r7c110.out 2>&1)
tail -3 benchmarks/validate_1m_r7c110.out | tee -a $LOG
echo "[r7m] ALL DONE" | tee -a $LOG
