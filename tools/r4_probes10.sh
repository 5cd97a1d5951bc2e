#!/bin/bash
# r4 batch 10: m_tile sweep for the prefill kernel at large M (gateup).
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes9.log 2>/dev/null; do sleep 30; done
for MT in 128 512 1024; do
  echo "=== mtile=$MT gateup $(date +%H:%M:%S) ===" >> $L/probes10.log
  env LCTPU_MTILE=$MT WHICH=gateup MS=1024,4096 VARIANTS=pallas8 timeout 3000 python tools/prefill_matmul_sweep.py >> $L/probes10.log 2>&1
done
echo ALL_DONE >> $L/probes10.log
