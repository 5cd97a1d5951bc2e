#!/bin/bash
# r5: engine table refresh with defer+split defaults — 32x1024 (r4: 12.21)
# and 16x1024 (r4: 9.58).  NEVER edit while queued/running.
cd /root/repo
L=tools/r5logs
while ! grep -q "ALL DONE" $L/bench_final.log 2>/dev/null; do sleep 60; done
run() {
  name=$1; shift
  echo "=== $name $(date +%H:%M:%S) ===" >> $L/slots_ab.log
  env "$@" ATTN=auto timeout 3600 \
    python tools/engine_step_probe.py >> $L/slots_ab.log 2>&1
  echo "rc=$?" >> $L/slots_ab.log
}
run s32_t1024 SLOTS=32 T=1024
run s16_t1024 SLOTS=16 T=1024
echo "ALL DONE $(date +%H:%M:%S)" >> $L/slots_ab.log
