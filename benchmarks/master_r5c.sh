#!/bin/bash
# Queue C: re-validate after the carry-key fix, then 10M cfg5 re-run
# under the lane_batch defaults, then the cell-factor sweep.
LOG=/root/repo/benchmarks/master_r5c.log
run_step () {
  local name=$1 sentinel=$2 out=$3; shift 3
  if [ -f "$out" ] && grep -q "$sentinel" "$out"; then
    echo "[r5c] $name already done" | tee -a $LOG; return 0
  fi
  for i in 1 2; do
    echo "[r5c] $name attempt $i $(date +%H:%M:%S)" | tee -a $LOG
    timeout 5400 "$@" > "$out" 2>&1
    rc=$?
    if [ $rc -eq 0 ] && grep -q "$sentinel" "$out"; then
      echo "[r5c] $name OK" | tee -a $LOG; return 0
    fi
    echo "[r5c] $name rc=$rc retrying" | tee -a $LOG; sleep 20
  done
  echo "[r5c] $name FAILED" | tee -a $LOG; return 1
}
cd /root/repo/benchmarks
run_step validate VALID validate_1m_r5.out python validate_1m.py
cd /root/repo
run_step headline2 pairs_per_sec benchmarks/bench_headline_r5b.out python bench.py
cd /root/repo/benchmarks
run_step cfg5 "pairs/s" bench_10m_cfg5_r5.out env ITERS=6 python bench_10m_cfg5.py

run_one () {
  local tag=$1; shift
  local out=/root/repo/benchmarks/sweep_r5cell_$tag.out
  if [ -f "$out" ] && grep -q pairs_per_sec "$out"; then
    echo "[r5c] sweep $tag already done" | tee -a $LOG; return 0
  fi
  echo "[r5c] sweep $tag start $(date +%H:%M:%S)" | tee -a $LOG
  (timeout 2400 env "$@" python bench.py > "$out" 2>&1)
  tail -1 "$out" | tee -a $LOG
}
run_one c050_p4   BENCH_CELLF=0.5  BENCH_PACK=4  BENCH_LB=1
run_one c050_p8   BENCH_CELLF=0.5  BENCH_PACK=8  BENCH_LB=1
run_one c060_p4   BENCH_CELLF=0.6  BENCH_PACK=4  BENCH_LB=1
run_one c075_p8   BENCH_CELLF=0.75 BENCH_PACK=8  BENCH_LB=1
run_one c050_p4t4 BENCH_CELLF=0.5  BENCH_PACK=4  BENCH_LB=1 BENCH_TPS=4
echo "[r5c] ALL DONE" | tee -a $LOG
