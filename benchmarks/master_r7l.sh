#!/bin/bash
# r7l: cell-size re-sweep at the new 93.9 ms default — the prep/records
# shrank, so the staged-volume optimum may have shifted off cell = 1.0r
# (the r3 census put a shallow optimum near 1.15r).  Sentinel:
# "[r7l] ALL DONE".
LOG=/root/repo/benchmarks/master_r7l.log
cd /root/repo
for i in $(seq 1 500); do
  grep -q "ALL DONE" benchmarks/master_r7k.log 2>/dev/null && break
  sleep 15
done
run_one () {
  local tag=$1; shift
  local out=/root/repo/benchmarks/bench_$tag.out
  echo "[r7l] $tag start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 2400 env "$@" python bench.py > "$out" 2>&1)
  tail -1 "$out" | tee -a $LOG
}
run_one r7l_c110 BENCH_CELLF=1.1
run_one r7l_c125 BENCH_CELLF=1.25
echo "[r7l] ALL DONE" | tee -a $LOG
