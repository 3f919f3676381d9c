#!/bin/bash
cd /root/repo
for tps in 8 4; do
  echo "== split reuse tps=$tps =="
  BENCH_SPLIT=1 BENCH_REUSE=1 BENCH_TPS=$tps timeout 1800 python bench.py > benchmarks/bench_r10_split_reuse_tps$tps.out 2>&1
  echo "rc=$?" >> benchmarks/bench_r10_split_reuse_tps$tps.out
done
echo done
