#!/bin/bash
cd /root/repo
L=tools/r4logs
echo "=== bench DOWNSPLIT=1 c2048 retry $(date +%H:%M:%S) ===" >> $L/probes25.log
env BENCH_DOWNSPLIT=1 BENCH_ENGINE=0 timeout 5000 python bench.py >> $L/probes25.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes25.log
echo "=== xla4r 32x8192 rows2048 $(date +%H:%M:%S) ===" >> $L/probes25.log
env ATTN=xla4r KV=4 SLOTS=32 T=8192 LCTPU_PREFILL_ROWS=2048 timeout 3300 python tools/engine_step_probe.py >> $L/probes25.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes25.log
echo ALL_DONE >> $L/probes25.log
