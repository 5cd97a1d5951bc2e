#!/bin/bash
# r4 batch 2: residual-gap ablation + bd at 32 slots + bd4/kv4 engine.
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes1.log 2>/dev/null; do sleep 30; done
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $L/probes2.log
  env "$@" timeout 3000 python tools/engine_step_probe.py >> $L/probes2.log 2>&1
  echo "exit=$? $(date +%H:%M:%S)" >> $L/probes2.log
}
run ATTN=xla8a SLOTS=32 T=1024 LCTPU_ABLATE_ATTN=1
run ATTN=xla8a SLOTS=16 T=1024
run ATTN=bd SLOTS=32 T=1024
run ATTN=bd4 KV=4 SLOTS=32 T=1024
echo ALL_DONE >> $L/probes2.log
