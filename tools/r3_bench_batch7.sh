#!/bin/bash
cd /root/repo
L=tools/r3logs
run() {
  name=$1; shift
  ( echo "ENV: $*"; env "$@" timeout 9000 python bench.py ) > $L/$name.log 2>&1 &
}
# long-context attention: the bd kernels keep scores in VMEM, the XLA
# einsum path materializes f32 score/prob intermediates (collapse at 4k+)
run bds512_c4096 BENCH_ATTN=bds BENCH_SBLOCK=512 BENCH_CTX=4096
run bd_c2048     BENCH_ATTN=bd  BENCH_CTX=2048
run bds512_c2048 BENCH_ATTN=bds BENCH_SBLOCK=512 BENCH_CTX=2048
( env N=8 T=64 timeout 7200 python tools/ttft_probe.py ) > $L/ttft_t64.log 2>&1 &
wait
echo ALL DONE
