#!/bin/bash
# Round-5 queue 3: MP arms with the in-jit span slicing (queue-2 OOMed on
# the doubled quant HBM), then attention diagnostics, then quality
# ablations + profiled sigma/mmdit.
set -x
cd /root/repo
OUT=benchmarks/tpu_pending_results.txt
echo "=== round-5 queue3 $(date -u +%FT%TZ) ===" >> $OUT

echo "--- t20mp (in-jit span slicing) ---" >> $OUT
timeout 3600 python benchmarks/bench_configs.py t20mp >> $OUT 2>&1

echo "--- latte (in-jit span slicing) ---" >> $OUT
timeout 3600 python benchmarks/bench_configs.py latte >> $OUT 2>&1

echo "--- w4a8 full recipe ---" >> $OUT
timeout 3600 python benchmarks/bench_configs.py w4a8 >> $OUT 2>&1

echo "--- attn_sched occupancy + bq sweep ---" >> $OUT
timeout 2400 python benchmarks/attn_sched.py >> $OUT 2>&1

echo "--- sigma1024 + mmdit with op profile ---" >> $OUT
VIDITQ_PROFILE=1 timeout 3600 python benchmarks/bench_configs.py sigma1024 mmdit >> $OUT 2>&1

echo "--- w4a8 midbits=6 (quality knob, identical throughput) ---" >> $OUT
VIDITQ_W4A8_MIDBITS=6 timeout 3600 python benchmarks/bench_configs.py w4a8 >> $OUT 2>&1

echo "--- w4a8 floor (weights-only W4) ---" >> $OUT
VIDITQ_W4A8_FLOOR=1 timeout 3600 python benchmarks/bench_configs.py w4a8 >> $OUT 2>&1

echo "=== round-5 queue3 done $(date -u +%FT%TZ) ===" >> $OUT
tail -5 $OUT
