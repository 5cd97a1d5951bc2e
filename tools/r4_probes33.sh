#!/bin/bash
# r4 batch 33: bdr (flash kernel main term inside the ring chunk).
cd /root/repo
L=tools/r4logs
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $L/probes33.log
  env "$@" timeout 3300 python tools/engine_step_probe.py >> $L/probes33.log 2>&1
  echo "exit=$? $(date +%H:%M:%S)" >> $L/probes33.log
}
run ATTN=bdr SLOTS=32 T=2048
run ATTN=bdr SLOTS=16 T=4096
run ATTN=bdr SLOTS=32 T=1024
echo ALL_DONE >> $L/probes33.log
