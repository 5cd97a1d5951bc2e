#!/bin/bash
# r5 engine-gap round 3: (a) does buffer granularity alone explain the
# engine's main-term read rate?  Stacked invariant bench cache vs the
# per-layer-list control (2621-2635 known).  (b) defer+blockwise combo.
# (c) ring-step main-read ablation (LCTPU_ABLATE_ATTN=1 on xla8r).
# NEVER edit while queued/running (CLAUDE.md).
cd /root/repo
L=tools/r5logs
while ! grep -q "^rc=" $L/bench_w4a16_contig.log 2>/dev/null; do sleep 60; done
echo "=== stacked bench c2048 $(date +%H:%M:%S) ===" >> $L/stacked_bench.log
BENCH_KV_STACKED=1 BENCH_ENGINE=0 timeout 5400 python bench.py \
  >> $L/stacked_bench.log 2>&1
echo "rc=$?" >> $L/stacked_bench.log
run() {
  name=$1; shift
  echo "=== $name $(date +%H:%M:%S) ===" >> $L/defer_blk.log
  env "$@" SLOTS=32 T=2048 ATTN=auto timeout 3600 \
    python tools/engine_step_probe.py >> $L/defer_blk.log 2>&1
  echo "rc=$?" >> $L/defer_blk.log
}
run defer_blk1024 LCTPU_RING_DEFER=1 LCTPU_MAIN_BLOCK=1024
run defer_ablate_attn LCTPU_RING_DEFER=1 LCTPU_ABLATE_ATTN=1
echo "ALL DONE $(date +%H:%M:%S)" >> $L/defer_blk.log
echo "ALL DONE $(date +%H:%M:%S)" >> $L/stacked_bench.log
