#!/bin/bash
# r5 engine-gap round 4: per-layer split-cache reads in the ring chunk
# (LCTPU_RING_SPLITCACHE=1) — does buffer granularity restore the bench's
# read/weight overlap engine-side?  NEVER edit while queued/running.
cd /root/repo
L=tools/r5logs
while ! grep -q "ALL DONE" $L/defer_blk.log 2>/dev/null; do sleep 60; done
run() {
  name=$1; shift
  echo "=== $name $(date +%H:%M:%S) ===" >> $L/splitcache.log
  env "$@" SLOTS=32 T=2048 ATTN=auto timeout 3600 \
    python tools/engine_step_probe.py >> $L/splitcache.log 2>&1
  echo "rc=$?" >> $L/splitcache.log
}
run split LCTPU_RING_SPLITCACHE=1
run split_defer LCTPU_RING_SPLITCACHE=1 LCTPU_RING_DEFER=1
echo "ALL DONE $(date +%H:%M:%S)" >> $L/splitcache.log
