#!/bin/bash
# r9f: knob sweeps at the reuse operating point (r9c: reuse 67.2 ms).
LOG=/root/repo/benchmarks/master_r9f.log
cd /root/repo
while ! grep -aq "\[r9e\] ALL DONE" benchmarks/master_r9e.log 2>/dev/null; do
  sleep 30
done
run_leg () {
  local name=$1; shift
  echo "[r9f] $name start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 3000 env BENCH_REUSE=1 "$@" python bench.py \
     > benchmarks/bench_r9f_$name.out 2>&1)
  grep -a "ms_per_run" benchmarks/bench_r9f_$name.out | tail -1 | tee -a $LOG
}
run_leg tps4 BENCH_TPS=4
run_leg c120 BENCH_CELLF=1.20
run_leg c125 BENCH_CELLF=1.25
run_leg p16c115 BENCH_PACK=16
run_leg pre6432 BENCH_PRE=64,32
echo "[r9f] ALL DONE" | tee -a $LOG
