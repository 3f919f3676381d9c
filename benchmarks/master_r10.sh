#!/bin/bash
# round-5 (session 2) hardware queue: split-stage A/B at the headline 1M config
cd /root/repo
echo "== split carry ==" 
BENCH_SPLIT=1 BENCH_REUSE=1 timeout 1800 python bench.py > benchmarks/bench_r10_split_reuse.out 2>&1
echo "rc=$?" >> benchmarks/bench_r10_split_reuse.out
echo "== split rebuild =="
BENCH_SPLIT=1 BENCH_REUSE=0 timeout 1800 python bench.py > benchmarks/bench_r10_split_rebuild.out 2>&1
echo "rc=$?" >> benchmarks/bench_r10_split_rebuild.out
echo done
