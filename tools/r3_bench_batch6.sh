#!/bin/bash
cd /root/repo
L=tools/r3logs
run() {
  name=$1; shift
  ( echo "ENV: $*"; env "$@" timeout 9000 python bench.py ) > $L/$name.log 2>&1 &
}
run b64_c1024   BENCH_BATCH=64
run b64_c2048   BENCH_BATCH=64 BENCH_CTX=2048
run kv8_c2048r  BENCH_CTX=2048
run b128_c1024  BENCH_BATCH=128
wait
echo ALL DONE
