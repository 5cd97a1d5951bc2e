#!/bin/bash
# r4 batch 12: ring-chunk engine decode on-chip.
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes11.log 2>/dev/null; do sleep 30; done
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $L/probes12.log
  env "$@" timeout 3000 python tools/engine_step_probe.py >> $L/probes12.log 2>&1
  echo "exit=$? $(date +%H:%M:%S)" >> $L/probes12.log
}
run ATTN=xla8r SLOTS=32 T=1024
run ATTN=xla8r SLOTS=16 T=1024
echo ALL_DONE >> $L/probes12.log
