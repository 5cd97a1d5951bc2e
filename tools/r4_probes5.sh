#!/bin/bash
# r4 batch 5: rerun the attention-read ablation (OOM-fixed kernel).
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes4.log 2>/dev/null; do sleep 30; done
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $L/probes5.log
  env "$@" timeout 3000 python tools/engine_step_probe.py >> $L/probes5.log 2>&1
  echo "exit=$? $(date +%H:%M:%S)" >> $L/probes5.log
}
run ATTN=xla8a SLOTS=32 T=1024 LCTPU_ABLATE_ATTN=1
echo ALL_DONE >> $L/probes5.log
