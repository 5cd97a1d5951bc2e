#!/bin/bash
# r4 batch 21: bench with the nt=1024 down tiles (validate end-to-end,
# engine artifact ON -> also revalidates the ring engine at c2048).
cd /root/repo
L=tools/r4logs
while ! grep -q ALL_DONE $L/probes20.log 2>/dev/null; do sleep 30; done
echo "=== bench: down nt=1024 + engine artifact $(date +%H:%M:%S) ===" >> $L/probes21.log
timeout 6000 python bench.py >> $L/probes21.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes21.log
echo "=== bench c1024 (weights frontier check) $(date +%H:%M:%S) ===" >> $L/probes21.log
env BENCH_CTX=1024 BENCH_ENGINE=0 timeout 4000 python bench.py >> $L/probes21.log 2>&1
echo "exit=$? $(date +%H:%M:%S)" >> $L/probes21.log
echo ALL_DONE >> $L/probes21.log
