#!/bin/bash
# chained TPU queue: (re)try the split validate if missing, then the 10M
# mask-contract attempt (bits ~9.7 GB/step; known-good cfg5 tiling)
cd /root/repo
if ! grep -q '"ok"\|all exact\|EXACT' benchmarks/validate_1m_r10_split.out 2>/dev/null; then
  if ! grep -q "^rc=0" benchmarks/validate_1m_r10_split.out 2>/dev/null; then
    echo "== retry split validate =="
    BENCH_SPLIT=1 timeout 1500 python benchmarks/validate_1m.py > benchmarks/validate_1m_r10_split.out 2>&1
    echo "rc=$?" >> benchmarks/validate_1m_r10_split.out
  fi
fi
echo "== 10M mask contract =="
BENCH_N=10000000 BENCH_R=0.00928 BENCH_ITERS=10 BENCH_SAMPLE_TILES=20 \
BENCH_WCAP=192 BENCH_TILES=88000 BENCH_FATCAP=1024 \
timeout 2400 python benchmarks/bench_mask_1m.py > benchmarks/bench_mask_10m_r10.out 2>&1
echo "rc=$?" >> benchmarks/bench_mask_10m_r10.out
echo done
