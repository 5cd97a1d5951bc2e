#!/bin/bash
# r4 batch 13: unpack decomposition (env fix), full s4 kernel retry,
# and the bench engine-artifact diagnosis rerun.
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes12.log 2>/dev/null; do sleep 30; done
echo "=== unpack roofline probe $(date +%H:%M:%S) ===" >> $L/probes13.log
timeout 4000 python tools/unpack_roofline_probe.py >> $L/probes13.log 2>&1
echo "=== s4 full kernel experiments $(date +%H:%M:%S) ===" >> $L/probes13.log
timeout 4000 python tools/s4_kernel_experiments.py >> $L/probes13.log 2>&1
echo "=== bench engine artifact rerun $(date +%H:%M:%S) ===" >> $L/probes13.log
timeout 6000 python bench.py >> $L/probes13.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes13.log
echo ALL_DONE >> $L/probes13.log
