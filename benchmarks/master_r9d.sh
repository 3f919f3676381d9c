#!/bin/bash
# r9d: lane-major flip microbench. Waits for r9c.
LOG=/root/repo/benchmarks/master_r9d.log
cd /root/repo
while ! grep -aq "\[r9c\] ALL DONE" benchmarks/master_r9c.log 2>/dev/null; do
  sleep 60
done
echo "[r9d] probe start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 3000 python benchmarks/probe_r9d.py > benchmarks/probe_r9d.out 2>&1)
grep -a "ms/loop\|Error\|error" benchmarks/probe_r9d.out | head | tee -a $LOG
echo "[r9d] ALL DONE" | tee -a $LOG
