#!/bin/bash
# W4A16 with default contig slab, re-run after the qlinear_apply routing
# fix (was 0.03 of roofline via the XLA fallback).
cd /root/repo
L=tools/r5logs
while ! grep -q "ALL DONE" $L/kv4_8k.log 2>/dev/null; do sleep 60; done
BENCH_ACT_BITS=16 BENCH_ENGINE=0 timeout 5400 python bench.py \
  >> $L/bench_w4a16_contig.log 2>&1
echo "rc=$?" >> $L/bench_w4a16_contig.log
