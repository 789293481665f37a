"""Quality gates for the perf plans (round-2 VERDICT next #9).

Every BENCH arm's quantization SEMANTICS gets a generation-quality number
next to its ms/step: run the tiny e2e pipeline (calib -> ptq ->
quant-generate -> fp inference) once per plan and table frame-MSE / PSNR
vs the FP generation. The semantics compared:

  w8a8_tpu_fused      — reference asym dynamic per-token acts
  w8a8_tpu_fused_sym  — symmetric acts (zero-point-free epilogues)
  w8a8_tpu_fused_sm8  — sym + softmax-int8 PV on temporal/cross attention
  viditq_w4a8         — W4A8 timerange CB + mixed-precision tables

The regression assertions pin the headline arm's deviations to a stated
bound of the reference-semantics arm: the sym and sm8 plans may not
degrade frame-MSE by more than 3x over asym on this pipeline (measured
headroom ~1.1-1.6x; see BENCH_NOTES round-3 quality table), and every
arm must stay in the PTQ-sane band (rel err < 0.1, the verify-skill
threshold). Plan semantics are backend-independent (fake-quant == int
kernel to 8-bit tolerance, tests/test_int_kernels.py,
test_attention_model_dispatch.py), so this CPU run gates the TPU arms.
"""

import os

import numpy as np
import pytest

from viditq_tpu import cli

pytestmark = pytest.mark.heavy

WORKLOAD = "configs/workload/opensora_tiny.py"
PLANS = {
    "asym": "configs/opensora/w8a8_tpu_fused.yaml",
    "sym": "configs/opensora/w8a8_tpu_fused_sym.yaml",
    "sm8": "configs/opensora/w8a8_tpu_fused_sm8.yaml",
    "w4a8": "configs/opensora/viditq_w4a8.yaml",
}


def _psnr(mse, peak):
    return 10.0 * np.log10(peak ** 2 / max(mse, 1e-20))


@pytest.fixture(scope="module")
def quality_table(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("quality"))
    common = ["--config", WORKLOAD, "--save_dir", d, "--num_samples", "1"]
    cli.main(["get-calib-data"] + common)
    cli.main(["inference"] + common)
    fp = np.load(os.path.join(d, "fp_samples.npz"))["samples"]
    peak = float(np.max(np.abs(fp)))
    rows = {}
    for name, plan in PLANS.items():
        cli.main(["ptq", "--config", WORKLOAD, "--save_dir", d,
                  "--ptq_config", plan,
                  "--calib_data", os.path.join(d, "calib_data.npz")])
        cli.main(["quant-generate"] + common +
                 ["--ptq_config", plan,
                  "--quant_ckpt", os.path.join(d, "quant_ckpt.npz")])
        q = np.load(os.path.join(d, "quant_samples.npz"))["samples"]
        mse = float(np.mean((q - fp) ** 2))
        rel = float(np.linalg.norm(q - fp) / np.linalg.norm(fp))
        rows[name] = {"mse": mse, "psnr": _psnr(mse, peak), "rel": rel}
        print(f"quality {name:5s} mse={mse:.3e} "
              f"psnr={rows[name]['psnr']:.2f}dB rel={rel:.4f}")
    return rows


def test_all_arms_in_ptq_sane_band(quality_table):
    for name, r in quality_table.items():
        assert np.isfinite(r["mse"]), name
        assert r["rel"] < 0.1, (name, r)


def test_sym_and_sm8_within_bound_of_asym(quality_table):
    """The headline (sm8) and sym arms deviate from reference semantics;
    their quality cost must stay bounded or the honest headline is the
    asym arm's 1.14x (round-2 VERDICT weak #2)."""
    base = quality_table["asym"]["mse"]
    assert quality_table["sym"]["mse"] <= 3.0 * base + 1e-12, quality_table
    assert quality_table["sm8"]["mse"] <= 3.0 * base + 1e-12, quality_table


def test_w4a8_worse_than_w8a8_but_sane(quality_table):
    # 4-bit weights must cost more than 8-bit, and stay in-band
    assert quality_table["w4a8"]["mse"] >= quality_table["asym"]["mse"]
    assert quality_table["w4a8"]["rel"] < 0.1, quality_table["w4a8"]
