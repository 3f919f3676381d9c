#!/bin/bash
# r9a: first hardware pass from the FIXED HEAD (ba8709a): the win_sorted
# sorted-window DMA mode + shift-slice networks are now committed and on
# by default.  Legs:
#   1. bench default (auto pack=16, cell 1.1r)  -> the driver's number
#   2. bench pack=8 cell=1.15r                  -> r8c best (79.6 ms)
#   3. validate_1m pack=8 cell=1.15r            -> hardware exactness
#   4. bench pack=8 cell=1.15r TNS_SHIFT_SLICE=0 -> roll control (r8d A/B)
#   5. 10M config-5 re-validation from HEAD
# Sentinel: "[r9a] ALL DONE".
LOG=/root/repo/benchmarks/master_r9a.log
cd /root/repo
run_leg () {
  local name=$1; shift
  echo "[r9a] $name start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 3000 env "$@" python benchmarks/../bench.py \
     > benchmarks/bench_r9a_$name.out 2>&1)
  grep -a "ms_per_run" benchmarks/bench_r9a_$name.out | tail -1 | tee -a $LOG
}
run_leg default BENCH_VERBOSE=1
run_leg p8c115 BENCH_VERBOSE=1 BENCH_PACK=8 BENCH_CELLF=1.15
echo "[r9a] validate p8c115 start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 3600 env BENCH_PACK=8 BENCH_CELLF=1.15 \
   python benchmarks/validate_1m.py > benchmarks/validate_1m_r9a_p8c115.out 2>&1)
tail -2 benchmarks/validate_1m_r9a_p8c115.out | tee -a $LOG
run_leg p8c115roll BENCH_VERBOSE=1 BENCH_PACK=8 BENCH_CELLF=1.15 TNS_SHIFT_SLICE=0
echo "[r9a] 10M cfg5 start $(date +%H:%M:%S)" | tee -a $LOG
(timeout 5400 python benchmarks/bench_10m_cfg5.py \
   > benchmarks/bench_10m_cfg5_r9a.out 2>&1)
tail -2 benchmarks/bench_10m_cfg5_r9a.out | tee -a $LOG
echo "[r9a] ALL DONE" | tee -a $LOG
