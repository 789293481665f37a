#!/bin/bash
# Round-5 queue 6: re-run the fc1-emission A/B with the lane-padded
# group-scale layout (queue-5's emit=1 arm failed Mosaic lowering on the
# 1-lane scales block).
set -x
cd /root/repo
OUT=benchmarks/tpu_pending_results.txt
echo "=== round-5 queue6 $(date -u +%FT%TZ) ===" >> $OUT

echo "--- block_bisect fused-allsym emit=1 (lane-padded scales) ---" >> $OUT
VIDITQ_EMIT_FC1=1 timeout 1800 python benchmarks/block_bisect.py bf16 fused-allsym >> $OUT 2>&1

echo "--- latte with pooled qkv CB (shared quantize producer) ---" >> $OUT
VIDITQ_CB_SHARE=1 timeout 3600 python benchmarks/bench_configs.py latte >> $OUT 2>&1

echo "--- w4a8 with pooled qkv CB ---" >> $OUT
VIDITQ_CB_SHARE=1 timeout 3600 python benchmarks/bench_configs.py w4a8 >> $OUT 2>&1

echo "=== round-5 queue6 done $(date -u +%FT%TZ) ===" >> $OUT
tail -8 $OUT
