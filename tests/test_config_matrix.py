"""The published experiment matrix of quant plans (reference
t2v/configs/quant/opensora + t2i/configs/quant/{alpha,sigma}) ported to
configs/: every plan must load, and one representative of each plan
category must run the tiny end-to-end CLI flow."""

import glob
import os

import numpy as np
import pytest

from viditq_tpu import cli
from viditq_tpu.utils.config import load_quant_config

ALL_PLANS = sorted(
    glob.glob("configs/opensora/*.yaml")
    + glob.glob("configs/pixart/*.yaml")
    + glob.glob("configs/pixart_sigma/*.yaml"))


@pytest.mark.parametrize("path", ALL_PLANS, ids=[p.split("configs/")[-1]
                                                 for p in ALL_PLANS])
def test_plan_loads(path):
    plan = load_quant_config(path)
    assert plan.default_layer.weight is not None
    r = plan.resolver()
    spec = r("blocks.0.mlp.fc1")
    assert spec is not None


def test_plan_count_matches_reference_matrix():
    """The reference ships 12 opensora plans + 5 alpha + 4 sigma; ours adds
    the TPU-native deployment plans on top."""
    n_opensora = len(glob.glob("configs/opensora/*.yaml"))
    n_alpha = len(glob.glob("configs/pixart/*.yaml"))
    n_sigma = len(glob.glob("configs/pixart_sigma/*.yaml"))
    assert n_opensora >= 12, n_opensora
    assert n_alpha >= 5, n_alpha
    assert n_sigma >= 4, n_sigma


# one representative per plan CATEGORY the round-1 suite didn't cover:
# static tensor-wise acts (naive/ptqd), timerange CB + mixed-precision
# (viditq_w4a8), and a sigma-family plan
E2E_CASES = [
    ("configs/workload/opensora_tiny.py", "configs/opensora/w8a8_naive.yaml"),
    ("configs/workload/opensora_tiny.py",
     "configs/opensora/viditq_w4a8.yaml"),
    ("configs/workload/pixart_tiny.py",
     "configs/pixart_sigma/w8a8_naive.yaml"),
]


@pytest.mark.parametrize("workload,plan", E2E_CASES,
                         ids=[p.split("/")[-1] for _, p in E2E_CASES])
@pytest.mark.heavy
def test_plan_category_e2e(tmp_path, workload, plan):
    d = str(tmp_path)
    common = ["--config", workload, "--save_dir", d, "--num_samples", "1"]
    cli.main(["get-calib-data"] + common)
    cli.main(["ptq", "--config", workload, "--save_dir", d,
              "--ptq_config", plan,
              "--calib_data", os.path.join(d, "calib_data.npz")])
    cli.main(["quant-generate"] + common +
             ["--ptq_config", plan,
              "--quant_ckpt", os.path.join(d, "quant_ckpt.npz")])
    out = np.load(os.path.join(d, "quant_samples.npz"))["samples"]
    assert np.isfinite(out).all()


def test_sm8_plan_scopes_softmax_to_temporal_and_cross():
    """The shipped TPU sm8 plan applies the softmax int8 quantizer ONLY to
    the measured-win sites (attn_temp, cross_attn) — the spatial attention
    stays bf16 (BENCH_NOTES round-2c)."""
    from viditq_tpu.utils.config import load_quant_config
    plan = load_quant_config("configs/opensora/w8a8_tpu_fused_sm8.yaml")
    r = plan.resolver()
    assert r("blocks.0.attn.q").softmax is None
    assert r("blocks.0.attn_temp.q").softmax is not None
    assert r("blocks.0.cross_attn.q_linear").softmax is not None
    assert r("blocks.0.mlp.fc1").softmax is None
    # attn8 = full reference semantics: quantizers everywhere
    plan8 = load_quant_config("configs/opensora/w8a8_tpu_fused_attn8.yaml")
    r8 = plan8.resolver()
    s = r8("blocks.0.attn.q")
    assert s.softmax is not None and s.attn_act is not None
    assert s.attn_act.sym and s.attn_act.dynamic
