#!/bin/bash
# r9h: combine the r9f winners (tps4, pre 64,32) and refine pre.
LOG=/root/repo/benchmarks/master_r9h.log
cd /root/repo
while ! grep -aq "\[r9g\] ALL DONE" benchmarks/master_r9g.log 2>/dev/null; do
  sleep 30
done
run_leg () {
  local name=$1; shift
  echo "[r9h] $name start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 3000 env BENCH_REUSE=1 "$@" python bench.py \
     > benchmarks/bench_r9h_$name.out 2>&1)
  grep -a "ms_per_run" benchmarks/bench_r9h_$name.out | tail -1 | tee -a $LOG
}
run_leg tps4pre6432 BENCH_TPS=4 BENCH_PRE=64,32
run_leg pre6424 BENCH_PRE=64,24
run_leg pre8032 BENCH_PRE=80,32
run_leg tps4pre6424 BENCH_TPS=4 BENCH_PRE=64,24
echo "[r9h] ALL DONE" | tee -a $LOG
