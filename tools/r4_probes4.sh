#!/bin/bash
# r4 batch 4: MoE gathered-vs-dense on-chip.
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes3.log 2>/dev/null; do sleep 30; done
echo "=== moe gather probe $(date +%H:%M:%S) ===" >> $L/probes4.log
timeout 3000 python tools/moe_gather_probe.py >> $L/probes4.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes4.log
echo ALL_DONE >> $L/probes4.log
