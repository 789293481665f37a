#!/bin/bash
# One-shot runner for every TPU measurement pending on the tunnel outage
# (round 3). Run from /root/repo when `python -c "import jax;
# jax.devices()"` responds. Appends raw JSON/logs to
# benchmarks/tpu_pending_results.txt; transcribe into BENCH_NOTES.md.
#
# Order: cheapest first so a flaky tunnel still yields data.
set -x
cd /root/repo
OUT=benchmarks/tpu_pending_results.txt
echo "==== run_tpu_pending $(date -u +%FT%TZ) ====" >> $OUT

# 1. headpack control (pad128 vs loop16 — BENCH_NOTES round-3c pending)
timeout 1200 python benchmarks/attn_headpack.py >> $OUT 2>&1

# 2. bf16 probability-storage bisect (round-3 VERDICT #1b second half):
#    same-run spatial-site block bisect, eager-norm default vs bf16p
timeout 1800 python benchmarks/block_bisect.py bf16 fused-sm8-scoped >> $OUT 2>&1
VIDITQ_ATTN_BF16P=1 timeout 1800 python benchmarks/block_bisect.py \
    bf16 fused-sm8-scoped >> $OUT 2>&1

# 3. the four remaining BASELINE config arms
for arm in w4a8 sigma1024 t20mp latte mmdit; do
  timeout 3600 python benchmarks/bench_configs.py $arm >> $OUT 2>&1
done

# 4. headline bench (records BENCH JSON; also run by the driver)
timeout 3600 python bench.py >> $OUT 2>&1

tail -40 $OUT
