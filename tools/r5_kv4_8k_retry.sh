#!/bin/bash
# r5: 32x8192 kv4 retry at PREFILL_CHUNK=512 — the PC=1024 run OOMed in
# chunked prefill (per-chunk f32 score transients vs the full 8k buffer:
# (1,32,1024,8272) f32 ~= 1.08GB/layer on top of 9GB cache + 4.2GB
# weights).  Halving the chunk halves the transient.
# NEVER edit while queued/running (CLAUDE.md).
cd /root/repo
L=tools/r5logs
while ! grep -q "ALL DONE" $L/splitcache.log 2>/dev/null; do sleep 60; done
echo "=== kv4 32x8192 pc512 $(date +%H:%M:%S) ===" >> $L/kv4_8k.log
SLOTS=32 T=8192 KV=4 PREFILL_CHUNK=512 ATTN=auto timeout 5400 \
  python tools/engine_step_probe.py >> $L/kv4_8k.log 2>&1
echo "rc=$?" >> $L/kv4_8k.log
echo "RETRY DONE $(date +%H:%M:%S)" >> $L/kv4_8k.log
