#!/bin/bash
# Round-5 queue 5: MP arms with host-side params aliasing (queue-4 OOM was
# XLA copying the bf16 params per span), fc1 int8-emission A/B at block
# level, W4 scale-method quality ablation, then a full bench.py to warm
# the persistent cache for the driver's round-end run.
set -x
cd /root/repo
OUT=benchmarks/tpu_pending_results.txt
echo "=== round-5 queue5 $(date -u +%FT%TZ) ===" >> $OUT

echo "--- block_bisect fused-allsym emit=1 vs 0 ---" >> $OUT
VIDITQ_EMIT_FC1=1 timeout 1800 python benchmarks/block_bisect.py bf16 fused-allsym >> $OUT 2>&1
echo "--- emit=0 ---" >> $OUT
VIDITQ_EMIT_FC1=0 timeout 1800 python benchmarks/block_bisect.py fused-allsym >> $OUT 2>&1

echo "--- w4a8 full recipe (params aliasing) ---" >> $OUT
timeout 3600 python benchmarks/bench_configs.py w4a8 >> $OUT 2>&1

echo "--- t20mp (params aliasing, profiled) ---" >> $OUT
VIDITQ_PROFILE=1 timeout 3600 python benchmarks/bench_configs.py t20mp >> $OUT 2>&1

echo "--- latte (params aliasing, profiled) ---" >> $OUT
VIDITQ_PROFILE=1 timeout 3600 python benchmarks/bench_configs.py latte >> $OUT 2>&1

echo "--- sigma1024 (streaming emission via external pass) ---" >> $OUT
timeout 3600 python benchmarks/bench_configs.py sigma1024 >> $OUT 2>&1

echo "--- w4a8 grid-search-Lp weight scales (quality ablation) ---" >> $OUT
VIDITQ_W4A8_SCALE=grid_search_lp timeout 3600 python benchmarks/bench_configs.py w4a8 >> $OUT 2>&1

echo "--- full bench.py (cache warm + emission headline check) ---" >> $OUT
timeout 3000 python bench.py >> $OUT 2>&1

echo "=== round-5 queue5 done $(date -u +%FT%TZ) ===" >> $OUT
tail -8 $OUT
