#!/bin/bash
# wait for probe_r5d to finish, then run the mismatch bisect
while kill -0 7417 2>/dev/null; do sleep 20; done
cd /root/repo/benchmarks
timeout 4800 python diag_mismatch_r5.py > diag_mismatch_r5.out 2>&1
echo "[watch] diag done rc=$?" >> /root/repo/benchmarks/master_r5.log
