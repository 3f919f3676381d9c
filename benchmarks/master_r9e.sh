#!/bin/bash
LOG=/root/repo/benchmarks/master_r9e.log
cd /root/repo
while ! grep -aq "\[r9d\] ALL DONE" benchmarks/master_r9d.log 2>/dev/null; do
  sleep 30
done
echo "[r9e] probe start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 3000 python benchmarks/probe_r9e.py > benchmarks/probe_r9e.out 2>&1)
grep -a "us/net\|rror" benchmarks/probe_r9e.out | head | tee -a $LOG
echo "[r9e] ALL DONE" | tee -a $LOG
