#!/bin/bash
# r4 batch 8: reruns — q-shape prefill sweep (unfused), bd/bd4 at 32
# slots now that batched prefill is rows-capped.
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes7.log 2>/dev/null; do sleep 30; done
echo "=== prefill sweep q unfused $(date +%H:%M:%S) ===" >> $L/probes8.log
env BENCH_FUSED=0 MS=512,1024,2048,4096 VARIANTS=pallas8,xla timeout 3000 python tools/prefill_matmul_sweep.py >> $L/probes8.log 2>&1
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $L/probes8.log
  env "$@" timeout 3000 python tools/engine_step_probe.py >> $L/probes8.log 2>&1
  echo "exit=$? $(date +%H:%M:%S)" >> $L/probes8.log
}
run ATTN=bd SLOTS=32 T=1024
run ATTN=bd4 KV=4 SLOTS=32 T=1024
echo ALL_DONE >> $L/probes8.log
