#!/bin/bash
# r4 batch 1: engine-append + append-first attention probes (sequential —
# each engine probe holds ~6.5GB HBM, parallel runs OOM the 16GB chip).
cd /root/repo
L=tools/r4logs
for cfg in "xla8a 32" "bd 16" "xla 32"; do
  set -- $cfg
  echo "=== ATTN=$1 SLOTS=$2 T=1024 $(date +%H:%M:%S) ===" >> $L/probes1.log
  ATTN=$1 SLOTS=$2 T=1024 timeout 3000 python tools/engine_step_probe.py >> $L/probes1.log 2>&1
  echo "exit=$? $(date +%H:%M:%S)" >> $L/probes1.log
done
echo ALL_DONE >> $L/probes1.log
