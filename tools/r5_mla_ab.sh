#!/bin/bash
# r5 MLA append-first A/B (VERDICT #3): per-step ms before/after, then
# the all-r5-changes dense engine probe at 32x2048.
# NEVER edit this file while it is queued/running (CLAUDE.md).
cd /root/repo
L=tools/r5logs
echo "=== mla read_concat $(date +%H:%M:%S) ===" >> $L/mla_ab.log
LCTPU_MLA_APPEND=0 timeout 3600 python tools/mla_engine_probe.py \
  >> $L/mla_ab.log 2>&1
echo "rc=$?" >> $L/mla_ab.log
echo "=== mla append_first $(date +%H:%M:%S) ===" >> $L/mla_ab.log
timeout 3600 python tools/mla_engine_probe.py >> $L/mla_ab.log 2>&1
echo "rc=$?" >> $L/mla_ab.log
echo "=== dense r5-all 32x2048 $(date +%H:%M:%S) ===" >> $L/mla_ab.log
SLOTS=32 T=2048 ATTN=auto timeout 3600 python tools/engine_step_probe.py \
  >> $L/mla_ab.log 2>&1
echo "rc=$?" >> $L/mla_ab.log
echo "ALL DONE $(date +%H:%M:%S)" >> $L/mla_ab.log
