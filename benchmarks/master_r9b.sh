#!/bin/bash
# r9b: attribution ladder at the p8c115 headline. Waits for r9a.
LOG=/root/repo/benchmarks/master_r9b.log
cd /root/repo
while ! grep -aq "\[r9a\] ALL DONE" benchmarks/master_r9a.log 2>/dev/null; do
  sleep 60
done
echo "[r9b] probe start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 4800 python benchmarks/probe_r9b.py > benchmarks/probe_r9b.out 2>&1)
grep -a "ms/step" benchmarks/probe_r9b.out | tee -a $LOG
echo "[r9b] ALL DONE" | tee -a $LOG
