#!/bin/bash
# r4 batch 6: full bench.py incl. the NEW engine-level artifact keys.
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes5.log 2>/dev/null; do sleep 30; done
echo "=== bench.py full (defaults + engine artifact) $(date +%H:%M:%S) ===" >> $L/probes6.log
timeout 6000 python bench.py >> $L/probes6.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes6.log
echo ALL_DONE >> $L/probes6.log
