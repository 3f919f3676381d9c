#!/bin/bash
# r7h: (a) expand-kernel record build A/B at 1M (BENCH_REXP=1 vs the
# committed 104.5 ms default), with BENCH_VERBOSE so the [tune] snug
# debug shows; (b) fresh validate_1m at the current headline program
# (kernel changed since validate_1m_r5.out); (c) if rexp wins, it gets
# defaulted separately.  Sentinel: "[r7h] ALL DONE".
LOG=/root/repo/benchmarks/master_r7h.log
cd /root/repo

run_one () {
  local tag=$1; shift
  local out=/root/repo/benchmarks/bench_$tag.out
  echo "[r7h] $tag start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 2400 env BENCH_VERBOSE=1 "$@" python bench.py > "$out" 2>&1)
  tail -1 "$out" | tee -a $LOG
  grep -a "tune\]" "$out" | tee -a $LOG
}
run_one r7h_rexp1 BENCH_REXP=1
run_one r7h_rexp0 BENCH_REXP=0
echo "[r7h] validate_1m start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 3000 python benchmarks/validate_1m.py > benchmarks/validate_1m_r7.out 2>&1)
tail -3 benchmarks/validate_1m_r7.out | tee -a $LOG
echo "[r7h] ALL DONE" | tee -a $LOG
