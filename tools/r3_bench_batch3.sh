#!/bin/bash
cd /root/repo
L=tools/r3logs
run() {
  name=$1; shift
  ( echo "ENV: $*"; env "$@" timeout 7200 python bench.py ) > $L/$name.log 2>&1 &
}
run e13_masked_all      BENCH_MASKED=qkv,o,gateup,down
run e14_masked_gud      BENCH_MASKED=gateup,down
run e15_masked_gu       BENCH_MASKED=gateup
wait
echo ALL DONE
