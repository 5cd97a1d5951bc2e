#!/bin/bash
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes10.log 2>/dev/null; do sleep 30; done
echo "=== moe gather probe (args fix) $(date +%H:%M:%S) ===" >> $L/probes11.log
timeout 3000 python tools/moe_gather_probe.py >> $L/probes11.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes11.log
echo ALL_DONE >> $L/probes11.log
