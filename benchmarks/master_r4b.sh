#!/bin/bash
# Follow-up TPU measurement queue: waits for master_r4.sh to finish, then
# runs the round-3 late-lever probes (same retry-on-UNAVAILABLE scheme).
cd /root/repo/benchmarks

while kill -0 "$(cat /tmp/master_r4.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done

run_step () {  # name, sentinel_grep, outfile, cmd...
  local name=$1 sentinel=$2 out=$3; shift 3
  if [ -f "$out" ] && grep -q "$sentinel" "$out"; then
    echo "[master-b] $name already done"; return 0
  fi
  for i in $(seq 1 40); do
    echo "[master-b] $name attempt $i $(date +%H:%M:%S)" \
      | tee -a master_r4b.log
    timeout 3600 "$@" > "$out" 2>&1
    rc=$?
    if [ $rc -eq 0 ] && grep -q "$sentinel" "$out"; then
      echo "[master-b] $name OK" | tee -a master_r4b.log; return 0
    fi
    if ! grep -q "UNAVAILABLE" "$out"; then
      echo "[master-b] $name failed rc=$rc (non-availability; moving on)" \
        | tee -a master_r4b.log
      return 1
    fi
    sleep 180
  done
  return 1
}

run_step probe_r4e "unpack sweep done" probe_r4e.out python probe_r4e.py
echo "[master-b] ALL DONE $(date +%H:%M:%S)" | tee -a master_r4b.log
