#!/bin/bash
# Round-5 measurement queue (sequential — one chip). Appends to
# benchmarks/tpu_pending_results.txt.
#
# Order = information value per minute:
#   1. MP arms after the per-span pre-slice fix (the round-4 "timestep-MP
#      overhead mystery": per-step HBM slab copies feeding the Pallas
#      matmul custom calls — pipelines/mixed_precision.py _slice_span)
#   2. headline profile: attribute the e2e-vs-block gap (sm8 + bf16)
#   3. kv-streaming attention sweep at sigma/mmdit shapes
set -x
cd /root/repo
OUT=benchmarks/tpu_pending_results.txt
echo "=== round-5 queue $(date -u +%FT%TZ) ===" >> $OUT

echo "--- t20mp + latte + w4a8 (per-span pre-sliced MP) ---" >> $OUT
timeout 5400 python benchmarks/bench_configs.py t20mp latte w4a8 >> $OUT 2>&1

echo "--- profile headline sm8 ---" >> $OUT
timeout 2400 python benchmarks/profile_headline.py sm8 40 >> $OUT 2>&1

echo "--- profile headline bf16 ---" >> $OUT
timeout 2400 python benchmarks/profile_headline.py bf16 40 >> $OUT 2>&1

echo "--- attn stream sweep (sigma + mmdit shapes) ---" >> $OUT
timeout 2400 python benchmarks/attn_stream_bench.py >> $OUT 2>&1

echo "=== round-5 queue done $(date -u +%FT%TZ) ===" >> $OUT
tail -5 $OUT
