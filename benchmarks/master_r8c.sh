#!/bin/bash
# r8c: pack=8 follow-ups after r8a found p8w256 best (82.4 ms at 1M):
#   - cell re-sweep at pack=8 (the optimum may shift with 8 phases)
#   - 10M config 5 at pack=8 (rec_pad +360 MB vs pack=16; ~8 GB HBM cap)
# Waits for r8b's sentinel.  Sentinel: "[r8c] ALL DONE".
LOG=/root/repo/benchmarks/master_r8c.log
cd /root/repo
while ! grep -aq "\[r8b\] ALL DONE" benchmarks/master_r8b.log 2>/dev/null; do
  sleep 60
done
run_leg () {
  local name=$1; shift
  echo "[r8c] $name start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 2400 env BENCH_VERBOSE=1 BENCH_ITERS=10 "$@" \
    python bench.py > benchmarks/bench_r8c_$name.out 2>&1)
  grep -a "ms_per_run\|knobs" benchmarks/bench_r8c_$name.out | tail -2 | tee -a $LOG
}
run_leg p8c105 BENCH_PACK=8 BENCH_CELLF=1.05
run_leg p8c115 BENCH_PACK=8 BENCH_CELLF=1.15
echo "[r8c] 10M p8 start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 4200 env ITERS=6 VALIDATE=1 REGROW=0 PACK=8 \
  python benchmarks/bench_10m_cfg5.py > benchmarks/bench_10m_cfg5_r8c.out 2>&1)
grep -a "steady state\|exact\|cfg5\|RESOURCE" benchmarks/bench_10m_cfg5_r8c.out | tail -4 | tee -a $LOG
echo "[r8c] ALL DONE" | tee -a $LOG
