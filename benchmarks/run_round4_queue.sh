#!/bin/bash
# Round-4 measurement queue (sequential — one chip). Appends to
# benchmarks/tpu_pending_results.txt.
set -x
cd /root/repo
OUT=benchmarks/tpu_pending_results.txt
echo "=== round-4 queue $(date -u +%FT%TZ) ===" >> $OUT

echo "--- attn_stream_bench (stat-batched kernel + block sweep) ---" >> $OUT
timeout 1800 python benchmarks/attn_stream_bench.py >> $OUT 2>&1

echo "--- attn_sched occupancy ---" >> $OUT
timeout 1800 python benchmarks/attn_sched.py >> $OUT 2>&1

echo "--- sigma1024 (stream on, stat-batched) ---" >> $OUT
timeout 2400 python benchmarks/bench_configs.py sigma1024 >> $OUT 2>&1

echo "--- mmdit (dedicated plan, stream on) ---" >> $OUT
timeout 2400 python benchmarks/bench_configs.py mmdit >> $OUT 2>&1

echo "--- w4a8 floor (weights-only W4) ---" >> $OUT
VIDITQ_W4A8_FLOOR=1 timeout 3600 python benchmarks/bench_configs.py w4a8 >> $OUT 2>&1

echo "--- w4a8 midbits=6 ---" >> $OUT
VIDITQ_W4A8_MIDBITS=6 timeout 3600 python benchmarks/bench_configs.py w4a8 >> $OUT 2>&1

echo "=== round-4 queue done $(date -u +%FT%TZ) ===" >> $OUT
tail -5 $OUT
