#!/bin/bash
# r4 batch 23: bench re-validation after the nt revert (+ engine artifact).
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes22.log 2>/dev/null; do sleep 30; done
echo "=== bench revert validation $(date +%H:%M:%S) ===" >> $L/probes23.log
timeout 6000 python bench.py >> $L/probes23.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes23.log
echo ALL_DONE >> $L/probes23.log
