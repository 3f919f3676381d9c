#!/bin/bash
# r9j: 10M config-5 with the round-5 1M winners (pack=8, cell=1.15r).
LOG=/root/repo/benchmarks/master_r9j.log
cd /root/repo
while ! grep -aq "\[r9i\] ALL DONE" benchmarks/master_r9i.log 2>/dev/null; do
  sleep 60
done
echo "[r9j] 10M p8c115 start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 5400 env PACK=8 CELLF=1.15 REGROW=0 python benchmarks/bench_10m_cfg5.py \
   > benchmarks/bench_10m_cfg5_r9j_p8c115.out 2>&1)
grep -a "ms_per_step\|steady" benchmarks/bench_10m_cfg5_r9j_p8c115.out | tail -2 | tee -a $LOG
echo "[r9j] 10M p16c115 start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 5400 env CELLF=1.15 REGROW=0 python benchmarks/bench_10m_cfg5.py \
   > benchmarks/bench_10m_cfg5_r9j_p16c115.out 2>&1)
grep -a "ms_per_step\|steady" benchmarks/bench_10m_cfg5_r9j_p16c115.out | tail -2 | tee -a $LOG
echo "[r9j] ALL DONE" | tee -a $LOG
