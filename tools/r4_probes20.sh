#!/bin/bash
# r4 batch 20: bds engine at 4k (buffer-rounding fix).
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes19.log 2>/dev/null; do sleep 30; done
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $L/probes20.log
  env "$@" timeout 3300 python tools/engine_step_probe.py >> $L/probes20.log 2>&1
  echo "exit=$? $(date +%H:%M:%S)" >> $L/probes20.log
}
run ATTN=bds SLOTS=16 T=4096
echo ALL_DONE >> $L/probes20.log
