#!/bin/bash
# Round-3/4 TPU measurement queue: runs each step with retry-on-backend-
# unavailable (the axon tunnel flaps; init failures raise UNAVAILABLE).
# Each step is skipped once its sentinel output exists and is complete.
cd /root/repo/benchmarks

run_step () {  # name, sentinel_grep, outfile, cmd...
  local name=$1 sentinel=$2 out=$3; shift 3
  if [ -f "$out" ] && grep -q "$sentinel" "$out"; then
    echo "[master] $name already done"; return 0
  fi
  for i in $(seq 1 40); do
    echo "[master] $name attempt $i $(date +%H:%M:%S)" | tee -a master_r4.log
    timeout 3600 "$@" > "$out" 2>&1
    rc=$?
    if [ $rc -eq 0 ] && grep -q "$sentinel" "$out"; then
      echo "[master] $name OK" | tee -a master_r4.log; return 0
    fi
    if ! grep -q "UNAVAILABLE" "$out"; then
      echo "[master] $name failed rc=$rc (non-availability error; moving on)" \
        | tee -a master_r4.log
      return 1
    fi
    sleep 180
  done
  return 1
}

run_step probe_r4a "S0 full" probe_r4a_run.out python probe_r4a.py
run_step validate "VALID" validate_1m_r4.out python validate_1m.py
run_step bench "vs_baseline" bench_headline_r4.out python ../bench.py
run_step wart "full kernel path" wart_tpu.out python wart_tpu.py
run_step probe_r4c "records parity" probe_r4c.out python probe_r4c.py
run_step probe_r4d "cell=1.5" probe_r4d.out python probe_r4d.py
echo "[master] ALL DONE $(date +%H:%M:%S)" | tee -a master_r4.log
