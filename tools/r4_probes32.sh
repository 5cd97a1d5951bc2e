#!/bin/bash
cd /root/repo
L=tools/r4logs
echo "=== xla4r 16x8192 v5 $(date +%H:%M:%S) ===" >> $L/probes32.log
env ATTN=xla4r KV=4 SLOTS=16 T=8192 PREFILL_CHUNK=1024 timeout 3300 python tools/engine_step_probe.py >> $L/probes32.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes32.log
echo ALL_DONE >> $L/probes32.log
