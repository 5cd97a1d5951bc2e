#!/bin/bash
# r5: 32 slots x 8192 kv4 ring — unblocked by the cache-reuse reset
# (r4 failed ~0.4GB over HBM with two caches transiently alive).
# NEVER edit while queued/running (CLAUDE.md).
cd /root/repo
L=tools/r5logs
while ! grep -q "ALL DONE" $L/defer_ab.log 2>/dev/null; do sleep 60; done
echo "=== kv4 32x8192 $(date +%H:%M:%S) ===" >> $L/kv4_8k.log
SLOTS=32 T=8192 KV=4 PREFILL_CHUNK=1024 ATTN=auto timeout 5400 \
  python tools/engine_step_probe.py >> $L/kv4_8k.log 2>&1
echo "rc=$?" >> $L/kv4_8k.log
echo "=== kv4 32x4096 $(date +%H:%M:%S) ===" >> $L/kv4_8k.log
SLOTS=32 T=4096 KV=4 PREFILL_CHUNK=1024 ATTN=auto timeout 5400 \
  python tools/engine_step_probe.py >> $L/kv4_8k.log 2>&1
echo "rc=$?" >> $L/kv4_8k.log
echo "ALL DONE $(date +%H:%M:%S)" >> $L/kv4_8k.log
