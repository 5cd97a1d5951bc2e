#!/bin/bash
# Round-3 perf batch 1: masked-unpack routing + S-split bd-attention,
# in the full bench stack. Runs in parallel (remote compiles overlap).
cd /root/repo
L=tools/r3logs
run() {
  name=$1; shift
  ( echo "ENV: $*"; env "$@" timeout 5400 python bench.py ) > $L/$name.log 2>&1 &
}
run e0_control
run e1_masked_qkv       BENCH_MASKED=qkv
run e2_masked_qkv_o     BENCH_MASKED=qkv,o
run e3_bds256           BENCH_ATTN=bds BENCH_SBLOCK=256
run e4_bds512           BENCH_ATTN=bds BENCH_SBLOCK=512
run e6_s4               BENCH_WLAYOUT=s4
wait
echo ALL DONE
for f in $L/e*.log; do echo "== $f"; tail -2 $f; done
