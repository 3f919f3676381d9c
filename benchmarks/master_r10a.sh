#!/bin/bash
# r10a: fused neighbor-reduce hardware legs + a HEAD-confirm bench run.
LOG=/root/repo/benchmarks/master_r10a.log
cd /root/repo
run_leg () {
  local name=$1; local script=$2; shift 2
  echo "[r10a] $name start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 4000 env "$@" python $script > benchmarks/bench_$name.out 2>&1)
  grep -a '"metric"' benchmarks/bench_$name.out | tail -1 | tee -a $LOG
}
run_leg r10a_reduce benchmarks/bench_reduce_1m.py TNS_DUMMY=1
run_leg r10a_head bench.py TNS_DUMMY=1
echo "[r10a] ALL DONE" | tee -a $LOG
