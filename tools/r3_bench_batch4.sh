#!/bin/bash
# kv4 vs kv8 context crossover curve (VERDICT r2 #5).
# kv8 at 8k ctx would OOM (17.4GB cache); kv4 halves it.
cd /root/repo
L=tools/r3logs
run() {
  name=$1; shift
  ( echo "ENV: $*"; env "$@" timeout 7200 python bench.py ) > $L/$name.log 2>&1 &
}
run kv8_c1024 BENCH_KV_BITS=8 BENCH_CTX=1024
run kv8_c2048 BENCH_KV_BITS=8 BENCH_CTX=2048
run kv8_c4096 BENCH_KV_BITS=8 BENCH_CTX=4096
run kv4_c1024 BENCH_KV_BITS=4 BENCH_CTX=1024
run kv4_c2048 BENCH_KV_BITS=4 BENCH_CTX=2048
run kv4_c4096 BENCH_KV_BITS=4 BENCH_CTX=4096
run kv4_c8192 BENCH_KV_BITS=4 BENCH_CTX=8192
wait
echo ALL DONE
