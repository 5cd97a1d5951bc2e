#!/bin/bash
# r5 MoE stacked-kernel A/B: base int8 dots vs small-M bf16 block dots
# (w4a8_stacked_matmul_smallm) at E=64 I=2048 H=4096, n in {4,8,32}.
# NEVER edit this file while it is queued/running (CLAUDE.md).
cd /root/repo
L=tools/r5logs
echo "=== base $(date +%H:%M:%S) ===" >> $L/moe_ab.log
IMPLS=dense NS=4,8,32 LCTPU_MOE_SMALLM=0 timeout 3000 \
  python tools/moe_gather_probe.py >> $L/moe_ab.log 2>&1
echo "=== smallm $(date +%H:%M:%S) ===" >> $L/moe_ab.log
IMPLS=dense NS=4,8,32 LCTPU_MOE_SMALLM=32 timeout 3000 \
  python tools/moe_gather_probe.py >> $L/moe_ab.log 2>&1
echo "ALL DONE $(date +%H:%M:%S)" >> $L/moe_ab.log
