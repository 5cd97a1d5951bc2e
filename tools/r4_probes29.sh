#!/bin/bash
cd /root/repo
L=tools/r4logs
echo "=== xla4r 24x8192 v3 $(date +%H:%M:%S) ===" >> $L/probes29.log
env ATTN=xla4r KV=4 SLOTS=24 T=8192 PREFILL_CHUNK=1024 timeout 3300 python tools/engine_step_probe.py >> $L/probes29.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes29.log
echo ALL_DONE >> $L/probes29.log
