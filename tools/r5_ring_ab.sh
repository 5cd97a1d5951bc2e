#!/bin/bash
# r5 engine-gap A/B: ring fusion (2 dus/layer) + blockwise main softmax
# at the bench context (32 slots x 2048).  SEQUENTIAL: each probe holds
# ~9GB on the chip (weights+cache), two concurrent would OOM.
# NEVER edit this file while it is queued/running (CLAUDE.md).
cd /root/repo
L=tools/r5logs
run() {
  name=$1; shift
  echo "=== $name $(date +%H:%M:%S) ===" >> $L/ring_ab.log
  env "$@" SLOTS=32 T=2048 ATTN=auto timeout 3000 \
    python tools/engine_step_probe.py >> $L/ring_ab.log 2>&1
  echo "rc=$?" >> $L/ring_ab.log
}
run base_r4 LCTPU_RING_FUSED=0
run fused LCTPU_RING_FUSED=1
run fused_blk1024 LCTPU_RING_FUSED=1 LCTPU_MAIN_BLOCK=1024
run fused_blk512 LCTPU_RING_FUSED=1 LCTPU_MAIN_BLOCK=512
echo "ALL DONE $(date +%H:%M:%S)" >> $L/ring_ab.log
