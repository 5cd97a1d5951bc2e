#!/bin/bash
# r5: kv4 long-context retries AFTER the read_kv_slot fix (chunked
# prefill no longer dequantizes all 32 slots per layer — the "program
# 10.33G" AOT OOM).  4096 also re-run at PC=0, the r4 parity config.
# NEVER edit while queued/running (CLAUDE.md).
cd /root/repo
L=tools/r5logs
while ! grep -q "ALL DONE" $L/splitcache.log 2>/dev/null; do sleep 60; done
run() {
  name=$1; T=$2; PC=$3
  echo "=== $name $(date +%H:%M:%S) ===" >> $L/kv4_8k.log
  SLOTS=32 T=$T KV=4 PREFILL_CHUNK=$PC ATTN=auto timeout 5400 \
    python tools/engine_step_probe.py >> $L/kv4_8k.log 2>&1
  echo "rc=$?" >> $L/kv4_8k.log
}
run kv4_32x4096_pc0 4096 0
run kv4_32x8192_pc1024_fix 8192 1024
echo "RETRY DONE $(date +%H:%M:%S)" >> $L/kv4_8k.log
