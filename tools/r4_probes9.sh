#!/bin/bash
# r4 batch 9: xla8a cost decomposition at 32 slots:
#   full (14.84 known) / no-cache-read (+appends) / no-read-no-append.
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes8.log 2>/dev/null; do sleep 30; done
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $L/probes9.log
  env "$@" timeout 3000 python tools/engine_step_probe.py >> $L/probes9.log 2>&1
  echo "exit=$? $(date +%H:%M:%S)" >> $L/probes9.log
}
run ATTN=xla8a SLOTS=32 T=1024 LCTPU_ABLATE_ATTN=2
echo ALL_DONE >> $L/probes9.log
