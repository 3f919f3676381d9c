#!/bin/bash
# r9g: lane-chunked staging network A/B at the reuse+tps4 point.
LOG=/root/repo/benchmarks/master_r9g.log
cd /root/repo
while ! grep -aq "\[r9f\] ALL DONE" benchmarks/master_r9f.log 2>/dev/null; do
  sleep 30
done
run_leg () {
  local name=$1; shift
  echo "[r9g] $name start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 3000 env BENCH_REUSE=1 BENCH_TPS=4 "$@" python bench.py \
     > benchmarks/bench_r9g_$name.out 2>&1)
  grep -a "ms_per_run" benchmarks/bench_r9g_$name.out | tail -1 | tee -a $LOG
}
run_leg chunk128 TNS_NET_CHUNK=128
run_leg chunk384 TNS_NET_CHUNK=384
run_leg chunk576 TNS_NET_CHUNK=576
echo "[r9g] ALL DONE" | tee -a $LOG
