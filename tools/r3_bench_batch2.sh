#!/bin/bash
cd /root/repo
L=tools/r3logs
run() {
  name=$1; shift
  ( echo "ENV: $*"; env "$@" timeout 7200 python bench.py ) > $L/$name.log 2>&1 &
}
run e7_unf_masked_kv    BENCH_FUSED=0 BENCH_MASKED=k,v
run e8_unf_masked_qkv   BENCH_FUSED=0 BENCH_MASKED=q,k,v
run e9_unf_masked_qkvo  BENCH_FUSED=0 BENCH_MASKED=q,k,v,o
run e12_tile8           LCTPU_TILE_MAX_MB=8
wait
echo ALL DONE
for f in $L/e7*.log $L/e8*.log $L/e9*.log $L/e12*.log; do echo "== $f"; tail -2 $f; done
