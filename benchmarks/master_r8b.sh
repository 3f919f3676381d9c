#!/bin/bash
# r8b: staging-network attribution probe (net_cap ladder) at the 1M
# headline config.  Waits for r8a's sentinel.  Sentinel: "[r8b] ALL DONE".
LOG=/root/repo/benchmarks/master_r8b.log
cd /root/repo
while ! grep -aq "\[r8a\] ALL DONE" benchmarks/master_r8a.log 2>/dev/null; do
  sleep 60
done
echo "[r8b] start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 3600 env ITERS=10 \
  python benchmarks/probe_r8b.py > benchmarks/probe_r8b.out 2>&1)
grep -a "ms/step\|settled" benchmarks/probe_r8b.out | tee -a $LOG
echo "[r8b] ALL DONE" | tee -a $LOG
