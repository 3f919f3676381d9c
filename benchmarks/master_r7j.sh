#!/bin/bash
# r7j: fresh attribution ladder at the new default (rec_expand auto-on,
# ~94 ms) to split the new record-build cost (sort payload / interleave /
# expand kernel ride S5-S6).  Sentinel: "[r7j] ALL DONE".
LOG=/root/repo/benchmarks/master_r7j.log
cd /root/repo
for i in $(seq 1 500); do
  grep -q "ALL DONE" benchmarks/master_r7i.log 2>/dev/null && break
  sleep 15
done
echo "[r7j] probe start $(date +%H:%M:%S)" | tee -a $LOG
timeout 3000 python benchmarks/probe_r7a.py > benchmarks/probe_r7j.out 2>&1
tail -16 benchmarks/probe_r7j.out | tee -a $LOG
echo "[r7j] ALL DONE" | tee -a $LOG
