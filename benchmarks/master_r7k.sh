#!/bin/bash
# r7k: end-of-round artifact refresh at the final engine state —
# BASELINE configs 2-4 (32k/500k SPH, fluid+boundary, variable+symmetric)
# and the temporal-coherence jiggle.  Sentinel: "[r7k] ALL DONE".
LOG=/root/repo/benchmarks/master_r7k.log
cd /root/repo
for i in $(seq 1 500); do
  grep -q "ALL DONE" benchmarks/master_r7j.log 2>/dev/null && break
  sleep 15
done
echo "[r7k] configs start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 3600 python benchmarks/bench_configs.py > benchmarks/bench_configs_r7.out 2>&1)
grep -a metric benchmarks/bench_configs_r7.out | tee -a $LOG
echo "[r7k] jiggle start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 3600 python benchmarks/bench_jiggle.py > benchmarks/bench_jiggle_r7.out 2>&1)
tail -3 benchmarks/bench_jiggle_r7.out | tee -a $LOG
echo "[r7k] ALL DONE" | tee -a $LOG
