#!/bin/bash
# r7i: after r7h — (a) bench at the new default (rec_expand auto-on,
# expect ~94 ms), (b) 10M config 5 with the expand record build (the
# gathers it replaces scale ~10x at 10M).  Sentinel: "[r7i] ALL DONE".
LOG=/root/repo/benchmarks/master_r7i.log
cd /root/repo
for i in $(seq 1 400); do
  grep -q "ALL DONE" benchmarks/master_r7h.log 2>/dev/null && break
  sleep 15
done
echo "[r7i] bench default start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 2400 env BENCH_VERBOSE=1 python bench.py > benchmarks/bench_r7i_default.out 2>&1)
tail -1 benchmarks/bench_r7i_default.out | tee -a $LOG
echo "[r7i] 10M cfg5 rexp start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 5400 env ITERS=6 VALIDATE=1 REGROW=0 \
  python benchmarks/bench_10m_cfg5.py > benchmarks/bench_10m_cfg5_r7i.out 2>&1)
grep -a "steady state\|exact\|cfg5" benchmarks/bench_10m_cfg5_r7i.out | tail -4 | tee -a $LOG
echo "[r7i] ALL DONE" | tee -a $LOG
