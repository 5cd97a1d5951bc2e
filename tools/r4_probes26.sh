#!/bin/bash
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes25.log 2>/dev/null; do sleep 30; done
echo "=== xla4r 32x8192 chunked prefill $(date +%H:%M:%S) ===" >> $L/probes26.log
env ATTN=xla4r KV=4 SLOTS=32 T=8192 PREFILL_CHUNK=1024 timeout 3300 python tools/engine_step_probe.py >> $L/probes26.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes26.log
echo ALL_DONE >> $L/probes26.log
