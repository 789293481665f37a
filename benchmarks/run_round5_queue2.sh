#!/bin/bash
# Round-5 queue 2: the MP arms (queue-1 run was voided by a stray process
# holding HBM -> RESOURCE_EXHAUSTED), then the W4A8 quality ablations and
# profiled sigma/mmdit arms.
set -x
cd /root/repo
OUT=benchmarks/tpu_pending_results.txt
echo "=== round-5 queue2 $(date -u +%FT%TZ) ===" >> $OUT

echo "--- t20mp + latte + w4a8 (per-span pre-sliced MP) ---" >> $OUT
timeout 7200 python benchmarks/bench_configs.py t20mp latte w4a8 >> $OUT 2>&1

echo "--- w4a8 floor (weights-only W4) ---" >> $OUT
VIDITQ_W4A8_FLOOR=1 timeout 3600 python benchmarks/bench_configs.py w4a8 >> $OUT 2>&1

echo "--- w4a8 midbits=6 ---" >> $OUT
VIDITQ_W4A8_MIDBITS=6 timeout 3600 python benchmarks/bench_configs.py w4a8 >> $OUT 2>&1

echo "--- sigma1024 + mmdit with op profile ---" >> $OUT
VIDITQ_PROFILE=1 timeout 3600 python benchmarks/bench_configs.py sigma1024 mmdit >> $OUT 2>&1

echo "=== round-5 queue2 done $(date -u +%FT%TZ) ===" >> $OUT
tail -5 $OUT
