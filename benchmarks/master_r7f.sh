#!/bin/bash
# r7f: bench after reverting the mask micro-tweaks (keep v2 compaction +
# pp de-gather).  Hypothesis from r7e algebra: ~98 ms.  Then the records
# micro-probe.  Waits for r7e to finish.  Sentinel: "[r7f] ALL DONE".
LOG=/root/repo/benchmarks/master_r7f.log
cd /root/repo
for i in $(seq 1 200); do
  grep -q "ALL DONE" benchmarks/master_r7e.log 2>/dev/null && break
  sleep 15
done
echo "[r7f] bench start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 2400 env BENCH_VERBOSE=1 python bench.py > benchmarks/bench_r7f_maskrev.out 2>&1)
tail -1 benchmarks/bench_r7f_maskrev.out | tee -a $LOG
echo "[r7f] probe_r7d start $(date +%H:%M:%S)" | tee -a $LOG
timeout 1800 python benchmarks/probe_r7d.py > benchmarks/probe_r7d.out 2>&1
tail -8 benchmarks/probe_r7d.out | tee -a $LOG
echo "[r7f] ALL DONE" | tee -a $LOG
