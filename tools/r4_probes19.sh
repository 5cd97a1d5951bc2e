#!/bin/bash
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes18.log 2>/dev/null; do sleep 30; done
echo "=== down tile sweep $(date +%H:%M:%S) ===" >> $L/probes19.log
timeout 4000 python tools/down_tile_probe.py >> $L/probes19.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes19.log
echo ALL_DONE >> $L/probes19.log
