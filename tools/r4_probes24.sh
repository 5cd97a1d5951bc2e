#!/bin/bash
# r4 batch 24: down K-split in-stack A/B + kv4 ring at 8k.
cd /root/repo
L=tools/r4logs
echo "=== bench DOWNSPLIT=1 c2048 $(date +%H:%M:%S) ===" >> $L/probes24.log
env BENCH_DOWNSPLIT=1 BENCH_ENGINE=0 timeout 5000 python bench.py >> $L/probes24.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes24.log
echo "=== xla4r 32x8192 $(date +%H:%M:%S) ===" >> $L/probes24.log
env ATTN=xla4r KV=4 SLOTS=32 T=8192 timeout 3300 python tools/engine_step_probe.py >> $L/probes24.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes24.log
echo ALL_DONE >> $L/probes24.log
