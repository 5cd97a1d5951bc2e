#!/bin/bash
# r4 batch 34: FINAL validation bench (post bdr-removal state).
cd /root/repo
L=tools/r4logs
echo "=== FINAL bench r4 $(date +%H:%M:%S) ===" >> $L/probes34.log
timeout 6000 python bench.py >> $L/probes34.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes34.log
echo ALL_DONE >> $L/probes34.log
