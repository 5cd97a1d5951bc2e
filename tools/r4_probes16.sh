#!/bin/bash
# r4 batch 16: MoE dense kernel with B-padding (gather disabled).
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes15.log 2>/dev/null; do sleep 30; done
echo "=== moe dense kernel (B-pad) $(date +%H:%M:%S) ===" >> $L/probes16.log
env IMPLS=dense NS=4,32 timeout 3000 python tools/moe_gather_probe.py >> $L/probes16.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes16.log
echo ALL_DONE >> $L/probes16.log
