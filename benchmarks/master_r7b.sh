#!/bin/bash
# r7b: fresh attribution ladder at the 109.4 ms row config.  Waits for the
# currently-running r7a bench leg to release the TPU (gate on the python
# process, then a settle pause).  Sentinel: "[r7b] ALL DONE".
LOG=/root/repo/benchmarks/master_r7b.log
cd /root/repo
for i in $(seq 1 200); do
  pgrep -f "python bench.py" > /dev/null 2>&1 || break
  sleep 15
done
sleep 5
echo "[r7b] probe_r7a start $(date +%H:%M:%S)" | tee -a $LOG
timeout 3000 python benchmarks/probe_r7a.py > benchmarks/probe_r7a.out 2>&1
tail -20 benchmarks/probe_r7a.out | tee -a $LOG
echo "[r7b] ALL DONE" | tee -a $LOG
