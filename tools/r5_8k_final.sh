#!/bin/bash
# r5: kv4 32x8192 after BOTH prefill fixes (read_kv_slot + last-row-only
# heads); PC=512 fallback.  NEVER edit while queued/running.
cd /root/repo
L=tools/r5logs
while ! grep -q "ALL DONE" $L/slots_ab.log 2>/dev/null; do sleep 60; done
run() {
  name=$1; PC=$2
  echo "=== $name $(date +%H:%M:%S) ===" >> $L/kv4_8k.log
  SLOTS=32 T=8192 KV=4 PREFILL_CHUNK=$PC ATTN=auto timeout 5400 \
    python tools/engine_step_probe.py >> $L/kv4_8k.log 2>&1
  echo "rc=$?" >> $L/kv4_8k.log
}
run kv4_32x8192_pc1024_fix2 1024
if ! grep -A2 "pc1024_fix2" $L/kv4_8k.log | grep -q "per_step_ms"; then
  run kv4_32x8192_pc512_fix2 512
fi
echo "FINAL8K DONE $(date +%H:%M:%S)" >> $L/kv4_8k.log
