#!/bin/bash
# r9k: dispatch-amortization sweep — ITERS 20/50 at the final defaults.
# The axon tunnel costs ~40 ms per host dispatch; at ITERS=10 that is
# ~4-8 ms/step of tunnel (not engine) time the CPU baseline never paid.
LOG=/root/repo/benchmarks/master_r9k.log
cd /root/repo
while ! grep -aq "\[r9j\] ALL DONE" benchmarks/master_r9j.log 2>/dev/null; do
  sleep 60
done
run_leg () {
  local name=$1; shift
  echo "[r9k] $name start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 3000 env "$@" python bench.py > benchmarks/bench_r9k_$name.out 2>&1)
  grep -a "ms_per_run" benchmarks/bench_r9k_$name.out | tail -1 | tee -a $LOG
}
run_leg iters20 BENCH_ITERS=20
run_leg iters50 BENCH_ITERS=50
run_leg iters50rebuild BENCH_ITERS=50 BENCH_REUSE=0
echo "[r9k] ALL DONE" | tee -a $LOG
