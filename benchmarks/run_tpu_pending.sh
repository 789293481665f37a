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

# 3b. asserted per-arm gates: every BASELINE arm must be >= 1.0x and the
# quality arms must hold their rel-err bounds (round-4 VERDICT items 1+3).
# Parses the LAST result line per arm from $OUT; exits non-zero on breach.
python - "$OUT" <<'EOF'
import json, sys
# (speedup floor, rel_err ceiling or None)
GATES = {
    "w4a8_viditq_full_stdit_xl2_16x512x512": (1.0, 0.05),
    "pixart_sigma_1024_kvcompress_w4a8_cb": (1.0, 0.05),
    "t20_timestep_mp_stdit_xl2_16x512x512": (1.0, None),
    "latte_xl2_16x256x256_w4a8_timestep_mp": (1.0, 0.05),
    "mmdit_1024_w4a8_stretch": (0.95, 0.05),
}
last = {}
for ln in open(sys.argv[1]):
    ln = ln.strip()
    if not ln.startswith("{"):
        continue
    try:
        d = json.loads(ln)
    except ValueError:
        continue
    if d.get("arm") in GATES:
        last[d["arm"]] = d
fails = []
for arm, (spd_min, rel_max) in GATES.items():
    d = last.get(arm)
    if d is None:
        fails.append(f"{arm}: NO RESULT")
        continue
    if d.get("speedup", 0) < spd_min:
        fails.append(f"{arm}: speedup {d.get('speedup')} < {spd_min}")
    rel = d.get("rel_err_vs_bf16")
    if rel_max is not None and (rel is None or rel > rel_max):
        fails.append(f"{arm}: rel_err {rel} > {rel_max}")
print("GATES:", "FAIL " + "; ".join(fails) if fails else "all pass")
sys.exit(1 if fails else 0)
EOF
GATE_RC=$?
echo "gate exit: $GATE_RC" >> $OUT

# 4. headline bench (records BENCH JSON; also run by the driver)
timeout 3600 python bench.py >> $OUT 2>&1

tail -40 $OUT
exit $GATE_RC
