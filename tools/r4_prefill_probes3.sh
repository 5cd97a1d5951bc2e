#!/bin/bash
# r4 batch 3: M-tiled prefill kernel on-chip vs XLA dense + batched TTFT.
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes2.log 2>/dev/null; do sleep 30; done
echo "=== prefill sweep q (4096x4096) $(date +%H:%M:%S) ===" >> $L/probes3.log
BENCH_FUSED=0 MS=512,1024,2048,4096 VARIANTS=pallas8,xla timeout 3000 python tools/prefill_matmul_sweep.py >> $L/probes3.log 2>&1
echo "=== prefill sweep gateup $(date +%H:%M:%S) ===" >> $L/probes3.log
WHICH=gateup MS=1024,4096 VARIANTS=pallas8,xla timeout 3000 python tools/prefill_matmul_sweep.py >> $L/probes3.log 2>&1
echo "=== ttft batched vs serial $(date +%H:%M:%S) ===" >> $L/probes3.log
timeout 3000 python tools/ttft_probe.py >> $L/probes3.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes3.log
echo ALL_DONE >> $L/probes3.log
