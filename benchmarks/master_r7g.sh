#!/bin/bash
# r7g: after r7f — (a) tps=4 A/B at 1M (pipeline-term check), (b) 10M
# config-5 with the shared-compaction multi-block kernel (expected to cut
# the 3x per-block compaction; bench_10m_cfg5_r5.out baseline 2324 ms).
# Sentinel: "[r7g] ALL DONE".
LOG=/root/repo/benchmarks/master_r7g.log
cd /root/repo
for i in $(seq 1 240); do
  grep -q "ALL DONE" benchmarks/master_r7f.log 2>/dev/null && break
  sleep 15
done
echo "[r7g] tps4 start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 2400 env BENCH_TPS=4 python bench.py > benchmarks/bench_r7g_tps4.out 2>&1)
tail -1 benchmarks/bench_r7g_tps4.out | tee -a $LOG
echo "[r7g] 10M cfg5 start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 5400 env ITERS=6 VALIDATE=1 REGROW=0 \
  python benchmarks/bench_10m_cfg5.py > benchmarks/bench_10m_cfg5_r7.out 2>&1)
grep -a "steady state\|pairs_per\|cfg5" benchmarks/bench_10m_cfg5_r7.out | tail -3 | tee -a $LOG
echo "[r7g] ALL DONE" | tee -a $LOG
