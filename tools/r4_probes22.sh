#!/bin/bash
# r4 batch 22: kv4 ring engine at long context — the 32-slot 4k/8k recipe.
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes21.log 2>/dev/null; do sleep 30; done
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $L/probes22.log
  env "$@" timeout 3300 python tools/engine_step_probe.py >> $L/probes22.log 2>&1
  echo "exit=$? $(date +%H:%M:%S)" >> $L/probes22.log
}
run ATTN=xla4r KV=4 SLOTS=32 T=4096
run ATTN=xla4r KV=4 SLOTS=32 T=1024
echo ALL_DONE >> $L/probes22.log
