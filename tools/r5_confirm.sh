#!/bin/bash
# r5 final confirmation: (1) pure-default bench (bare + engine frac with
# defer+splitcache defaults — the BENCH_r05 preview), (2) kv4 ring +
# splitcache A/B at 32x4096 PC=0.  NEVER edit while queued/running.
cd /root/repo
L=tools/r5logs
while ! grep -q "RETRY DONE" $L/kv4_8k.log 2>/dev/null; do sleep 60; done
echo "=== default bench $(date +%H:%M:%S) ===" >> $L/bench_final.log
timeout 5400 python bench.py >> $L/bench_final.log 2>&1
echo "rc=$?" >> $L/bench_final.log
echo "=== kv4 32x4096 pc0 SPLIT $(date +%H:%M:%S) ===" >> $L/kv4_split.log
SLOTS=32 T=4096 KV=4 PREFILL_CHUNK=0 ATTN=auto LCTPU_RING_SPLITCACHE=1 \
  timeout 5400 python tools/engine_step_probe.py >> $L/kv4_split.log 2>&1
echo "rc=$?" >> $L/kv4_split.log
echo "ALL DONE $(date +%H:%M:%S)" >> $L/bench_final.log
