#!/bin/bash
# r5 engine-gap round 2 at 32x2048: deferred ring write A/B + head-ablate
# decomposition.  NEVER edit while queued/running (CLAUDE.md).
cd /root/repo
L=tools/r5logs
run() {
  name=$1; shift
  echo "=== $name $(date +%H:%M:%S) ===" >> $L/defer_ab.log
  env "$@" SLOTS=32 T=2048 ATTN=auto timeout 3600 \
    python tools/engine_step_probe.py >> $L/defer_ab.log 2>&1
  echo "rc=$?" >> $L/defer_ab.log
}
run defer LCTPU_RING_DEFER=1
run ablate_head LCTPU_ABLATE_HEAD=1
run defer_ablate_head LCTPU_RING_DEFER=1 LCTPU_ABLATE_HEAD=1
echo "ALL DONE $(date +%H:%M:%S)" >> $L/defer_ab.log
