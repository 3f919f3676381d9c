#!/bin/bash
# Round-4 TPU queue B (after master_r5): cell-factor x stencil-width
# sweep at 1M.  With lane_batch amortizing per-window fixed costs, w=2
# at cell ~0.5-0.6r cuts padded candidate slots/query ~2-3x vs the
# w=1 cell=1.0r headline config (benchmarks/NOTES.md round-4 notes);
# per-window DMA count rises 25/9 — net is a hardware question.
LOG=/root/repo/benchmarks/master_r5b.log
cd /root/repo

# gate on queue A's completion sentinel (not pid; ADVICE r3)
for i in $(seq 1 240); do
  grep -q "ALL DONE" /root/repo/benchmarks/master_r5.log 2>/dev/null && break
  sleep 60
done

run_one () {
  local tag=$1; shift
  local out=/root/repo/benchmarks/sweep_r5cell_$tag.out
  if [ -f "$out" ] && grep -q pairs_per_sec "$out"; then
    echo "[master-r5b] $tag already done" | tee -a $LOG; return 0
  fi
  echo "[master-r5b] $tag start $(date +%H:%M:%S)" | tee -a $LOG
  timeout 2400 env "$@" python bench.py > "$out" 2>&1
  rc=$?
  tail -1 "$out" | tee -a $LOG
  echo "[master-r5b] $tag rc=$rc" | tee -a $LOG
}

run_one c050_p4   BENCH_CELLF=0.5  BENCH_PACK=4  BENCH_LB=1
run_one c050_p8   BENCH_CELLF=0.5  BENCH_PACK=8  BENCH_LB=1
run_one c060_p4   BENCH_CELLF=0.6  BENCH_PACK=4  BENCH_LB=1
run_one c075_p8   BENCH_CELLF=0.75 BENCH_PACK=8  BENCH_LB=1
run_one c050_p4t4 BENCH_CELLF=0.5  BENCH_PACK=4  BENCH_LB=1 BENCH_TPS=4
echo "[master-r5b] ALL DONE" | tee -a $LOG
