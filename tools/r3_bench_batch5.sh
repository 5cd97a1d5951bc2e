#!/bin/bash
cd /root/repo
L=tools/r3logs
run() {
  name=$1; shift
  ( echo "ENV: $*"; env "$@" timeout 9000 python bench.py ) > $L/$name.log 2>&1 &
}
# weights-dominated probe: CTX=64 makes KV negligible -> measures the
# weight-kernel stack's own roofline fraction
run probe_ctx64 BENCH_CTX=64
run bd4_c1024 BENCH_KV_BITS=4 BENCH_ATTN=bd4 BENCH_CTX=1024
run bd4_c4096 BENCH_KV_BITS=4 BENCH_ATTN=bd4 BENCH_CTX=4096
wait
echo ALL DONE
