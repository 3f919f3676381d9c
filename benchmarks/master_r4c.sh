#!/bin/bash
# Third TPU queue: after master_r4b (unpack sweep), re-validate the new
# phase_prefix default and re-measure the coherence benchmark (the in-loop
# carry wart no longer reproduces -- wart_tpu.out 2026-08-18).
cd /root/repo/benchmarks

# Wait on r4b's completion sentinel, not its pid: a stale pid file whose
# PID got reused would block forever, and a foreign-owner PID would fail
# kill -0 and start r4c concurrently on the same TPU (ADVICE r3).
while [ -f /tmp/master_r4b.pid ] \
    && ! grep -q "ALL DONE" master_r4b.log 2>/dev/null; do
  sleep 60
done

run_step () {
  local name=$1 sentinel=$2 out=$3; shift 3
  if [ -f "$out" ] && grep -q "$sentinel" "$out"; then
    echo "[master-c] $name already done"; return 0
  fi
  for i in $(seq 1 40); do
    echo "[master-c] $name attempt $i $(date +%H:%M:%S)" | tee -a master_r4c.log
    timeout 3600 "$@" > "$out" 2>&1
    rc=$?
    if [ $rc -eq 0 ] && grep -q "$sentinel" "$out"; then
      echo "[master-c] $name OK" | tee -a master_r4c.log; return 0
    fi
    if ! grep -q "UNAVAILABLE" "$out"; then
      echo "[master-c] $name failed rc=$rc (non-availability; moving on)" \
        | tee -a master_r4c.log
      return 1
    fi
    sleep 180
  done
  return 1
}

run_step validate_pp "VALID" validate_1m_r4b.out python validate_1m.py
run_step jiggle "coherence_jiggle_4000000" bench_jiggle_r4.out python bench_jiggle.py
echo "[master-c] ALL DONE $(date +%H:%M:%S)" | tee -a master_r4c.log
