#!/bin/bash
# r4 batch 35: in-kernel K-split down A/B (standalone sweep + bench).
cd /root/repo
L=tools/r4logs
echo "=== bench KSPLIT=1 c2048 $(date +%H:%M:%S) ===" >> $L/probes35.log
env BENCH_KSPLIT=1 BENCH_ENGINE=0 timeout 5000 python bench.py >> $L/probes35.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes35.log
echo ALL_DONE >> $L/probes35.log
