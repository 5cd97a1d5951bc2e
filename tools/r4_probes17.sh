#!/bin/bash
# r4 batch 17: rows-cap 4096 -> long-ctx ring/bds engine + honest unpack probe.
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes16.log 2>/dev/null; do sleep 30; done
echo "=== unpack roofline v3 $(date +%H:%M:%S) ===" >> $L/probes17.log
timeout 4000 python tools/unpack_roofline_probe.py >> $L/probes17.log 2>&1
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $L/probes17.log
  env "$@" timeout 3300 python tools/engine_step_probe.py >> $L/probes17.log 2>&1
  echo "exit=$? $(date +%H:%M:%S)" >> $L/probes17.log
}
run ATTN=xla8r SLOTS=32 T=2048
run ATTN=xla8r SLOTS=32 T=4096
run ATTN=bds SLOTS=32 T=4096
echo ALL_DONE >> $L/probes17.log
