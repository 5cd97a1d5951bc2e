#!/bin/bash
# r4 batch 7: weight-path floor decomposition + s4 Mosaic retry.
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes6.log 2>/dev/null; do sleep 30; done
echo "=== unpack roofline probe $(date +%H:%M:%S) ===" >> $L/probes7.log
timeout 4000 python tools/unpack_roofline_probe.py >> $L/probes7.log 2>&1
echo "=== s4 compile retry $(date +%H:%M:%S) ===" >> $L/probes7.log
timeout 2000 python tools/s4_compile_probe.py >> $L/probes7.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes7.log
echo ALL_DONE >> $L/probes7.log
