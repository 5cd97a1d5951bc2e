#!/bin/bash
# r4 batch 14: stacked-expert kernel on-chip (dense MoE fix).
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes13.log 2>/dev/null; do sleep 30; done
echo "=== moe stacked-planes kernel probe $(date +%H:%M:%S) ===" >> $L/probes14.log
timeout 4000 python tools/moe_gather_probe.py >> $L/probes14.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes14.log
echo ALL_DONE >> $L/probes14.log
