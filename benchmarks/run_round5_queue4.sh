#!/bin/bash
# Round-5 queue 4: MP arms with per-span slab packing (pack_native_weights
# tr_only — peak HBM base+one-span instead of base+stack+slices, the
# queue-3 OOM), and sigma1024 with emission-aware stream-block selection
# (the queue-3 Mosaic scoped-vmem compile OOM).
set -x
cd /root/repo
OUT=benchmarks/tpu_pending_results.txt
echo "=== round-5 queue4 $(date -u +%FT%TZ) ===" >> $OUT

echo "--- w4a8 full recipe (per-span packing) ---" >> $OUT
timeout 3600 python benchmarks/bench_configs.py w4a8 >> $OUT 2>&1

echo "--- t20mp (per-span packing) ---" >> $OUT
timeout 3600 python benchmarks/bench_configs.py t20mp >> $OUT 2>&1

echo "--- latte (per-span packing) ---" >> $OUT
timeout 3600 python benchmarks/bench_configs.py latte >> $OUT 2>&1

echo "--- sigma1024 (emission-aware stream blocks) ---" >> $OUT
timeout 3600 python benchmarks/bench_configs.py sigma1024 >> $OUT 2>&1

echo "--- w4a8 midbits=6 (quality knob) ---" >> $OUT
VIDITQ_W4A8_MIDBITS=6 timeout 3600 python benchmarks/bench_configs.py w4a8 >> $OUT 2>&1

echo "=== round-5 queue4 done $(date -u +%FT%TZ) ===" >> $OUT
tail -5 $OUT
