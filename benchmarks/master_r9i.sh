#!/bin/bash
# r9i: FINAL defaults from HEAD: plain bench.py (reuse + pre 64,32),
# a rebuild-every-step control, and the exactness validation at the
# exact final configuration.
LOG=/root/repo/benchmarks/master_r9i.log
cd /root/repo
while ! grep -aq "\[r9h\] ALL DONE" benchmarks/master_r9h.log 2>/dev/null; do
  sleep 30
done
echo "[r9i] default start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 3000 env BENCH_VERBOSE=1 python bench.py \
   > benchmarks/bench_r9i_default.out 2>&1)
grep -a "ms_per_run" benchmarks/bench_r9i_default.out | tail -1 | tee -a $LOG
echo "[r9i] rebuild control start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 3000 env BENCH_VERBOSE=1 BENCH_REUSE=0 python bench.py \
   > benchmarks/bench_r9i_rebuild.out 2>&1)
grep -a "ms_per_run" benchmarks/bench_r9i_rebuild.out | tail -1 | tee -a $LOG
echo "[r9i] validate start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 3600 python benchmarks/validate_1m.py \
   > benchmarks/validate_1m_r9i_final.out 2>&1)
tail -2 benchmarks/validate_1m_r9i_final.out | tee -a $LOG
echo "[r9i] ALL DONE" | tee -a $LOG
