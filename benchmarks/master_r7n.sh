#!/bin/bash
# r7n: 10M config 5 at cell = 1.1r (the 1M re-sweep optimum; the script
# default pins 1.0r).  Sentinel: "[r7n] ALL DONE".
LOG=/root/repo/benchmarks/master_r7n.log
cd /root/repo
echo "[r7n] 10M c1.1 start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 4200 env ITERS=6 VALIDATE=1 REGROW=0 CELLF=1.1 \
  python benchmarks/bench_10m_cfg5.py > benchmarks/bench_10m_cfg5_r7n.out 2>&1)
grep -a "steady state\|exact\|cfg5" benchmarks/bench_10m_cfg5_r7n.out | tail -4 | tee -a $LOG
echo "[r7n] ALL DONE" | tee -a $LOG
