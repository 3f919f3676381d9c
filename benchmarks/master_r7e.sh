#!/bin/bash
# r7e: isolate the kernel-edit regression that offsets the -6.5 ms prep
# win (bench 109.37 pre-edits vs 109.23 post).  A = v2 compaction OFF
# (mask tweaks stay), B = v2 ON (same as r7c, re-run for noise).
# Sentinel: "[r7e] ALL DONE".
LOG=/root/repo/benchmarks/master_r7e.log
cd /root/repo

run_one () {
  local tag=$1; shift
  local out=/root/repo/benchmarks/bench_$tag.out
  echo "[r7e] $tag start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 2400 env "$@" python bench.py > "$out" 2>&1)
  tail -1 "$out" | tee -a $LOG
}
run_one r7e_v2off TNS_COMPACT_V2=0
run_one r7e_v2on  TNS_COMPACT_V2=1
echo "[r7e] ALL DONE" | tee -a $LOG
