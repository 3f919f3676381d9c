#!/bin/bash
# Round-4 TPU queue A: headline re-measure with the lane_batch default +
# wcap effective-cap tune fix, headline-config validation, prep-stage
# attribution, and the 10M config-5 re-run under the new defaults.
cd /root/repo/benchmarks

run_step () {
  local name=$1 sentinel=$2 out=$3; shift 3
  if [ -f "$out" ] && grep -q "$sentinel" "$out"; then
    echo "[master-r5] $name already done" | tee -a /root/repo/benchmarks/master_r5.log; return 0
  fi
  for i in $(seq 1 3); do
    echo "[master-r5] $name attempt $i $(date +%H:%M:%S)" | tee -a /root/repo/benchmarks/master_r5.log
    timeout 5400 "$@" > "$out" 2>&1
    rc=$?
    if [ $rc -eq 0 ] && grep -q "$sentinel" "$out"; then
      echo "[master-r5] $name OK" | tee -a /root/repo/benchmarks/master_r5.log; return 0
    fi
    echo "[master-r5] $name rc=$rc retrying" | tee -a /root/repo/benchmarks/master_r5.log
    sleep 30
  done
  echo "[master-r5] $name FAILED" | tee -a /root/repo/benchmarks/master_r5.log; return 1
}

cd /root/repo
run_step headline pairs_per_sec benchmarks/bench_headline_r5.out \
  python bench.py
cd /root/repo/benchmarks
run_step validate VALID validate_1m_r5.out \
  python validate_1m.py
run_step prep_ladder "S0 full" probe_r5d.out \
  python probe_r5d.py
run_step cfg5 "pairs/s" bench_10m_cfg5_r5.out \
  env ITERS=6 python bench_10m_cfg5.py

echo "[master-r5] ALL DONE" | tee -a /root/repo/benchmarks/master_r5.log
