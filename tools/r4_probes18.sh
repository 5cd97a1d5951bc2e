#!/bin/bash
# r4 batch 18: long-ctx fallbacks at 16 slots (kv8 4k x 32 slots may OOM).
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes17.log 2>/dev/null; do sleep 30; done
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $L/probes18.log
  env "$@" timeout 3300 python tools/engine_step_probe.py >> $L/probes18.log 2>&1
  echo "exit=$? $(date +%H:%M:%S)" >> $L/probes18.log
}
if ! grep -q '"T": 4096' $L/probes17.log; then
  run ATTN=xla8r SLOTS=16 T=4096
  run ATTN=bds SLOTS=16 T=4096
fi
run ATTN=bd4 KV=4 SLOTS=32 T=4096
echo ALL_DONE >> $L/probes18.log
