"""Quality metric tests."""

import numpy as np
import pytest

from viditq_tpu.utils.metrics import (
    frame_mse, motion_magnitude, psnr, quality_report, temporal_consistency)


def test_basic_metrics():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1, 3, 4, 8, 8)).astype(np.float32) * 0.1
    assert frame_mse(a, a) == 0.0
    assert psnr(a, a) == float("inf")
    b = a + 0.1
    assert 0.009 < frame_mse(a, b) < 0.011
    # static video: perfect temporal consistency, zero motion
    static = np.broadcast_to(a[:, :, :1], a.shape).copy()
    assert temporal_consistency(static) > 0.999
    assert motion_magnitude(static) == 0.0
    # noisy video: low consistency, nonzero motion
    assert temporal_consistency(a) < 0.5
    assert motion_magnitude(a) > 0.05
    rep = quality_report(a, fp_reference=b)
    assert set(rep) == {"temporal_consistency", "motion_magnitude",
                        "mse_vs_fp", "psnr_vs_fp"}


@pytest.mark.heavy
def test_clip_scorer_and_sensitivity_metric():
    """ClipScorer plumbing (config-built tiny CLIP — no weights in this
    image) end-to-end on image + video inputs, and the
    make_sensitivity_metric contract the scans consume."""
    from viditq_tpu.utils.metrics import ClipScorer, make_sensitivity_metric

    scorer = ClipScorer()
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 3, 16, 16)).astype(np.float32) * 0.3
    vid = rng.standard_normal((2, 4, 6, 16, 16)).astype(np.float32) * 0.3
    s_img = scorer.score(img, ["a forest", "sea turtles"])
    s_vid = scorer.score(vid, ["a forest", "sea turtles"])
    assert -1.0 <= s_img <= 1.0 and -1.0 <= s_vid <= 1.0
    # deterministic for fixed inputs
    assert scorer.score(img, ["a forest", "sea turtles"]) == s_img

    m_mse = make_sensitivity_metric("mse")
    assert m_mse is frame_mse
    m_clip = make_sensitivity_metric("clip", prompts=["a forest"])
    ref = vid
    out = vid + 0.05
    d = m_clip(out, ref)
    assert np.isfinite(d)
    # identical generation has zero degradation (cached ref score)
    assert m_clip(ref, ref) == 0.0
    try:
        make_sensitivity_metric("nope")
    except ValueError:
        pass
    else:
        raise AssertionError("unknown metric must raise")


def test_sensitivity_scan_with_clip_metric():
    """The closed loop at the scan level: sensitivity_scan scores with a
    CLIP metric and generate_mp_config consumes the result — the
    metric-decoupled ranking path (round-3 VERDICT #9)."""
    from viditq_tpu.pipelines import analysis
    from viditq_tpu.quant import LayerQuantSpec, QuantSpec
    from viditq_tpu.utils.metrics import make_sensitivity_metric

    rng = np.random.default_rng(1)
    fp = rng.standard_normal((1, 3, 4, 8, 8)).astype(np.float32) * 0.3

    def run_with_resolver(resolver):
        if resolver is None or resolver("blocks.0.attn.q") is None:
            return fp
        # pretend quantizing 'attn' perturbs more than 'mlp'
        probe = resolver("blocks.0.attn.q")
        scale = 0.2 if (probe.weight is not None) else 0.0
        return fp + scale * rng.standard_normal(fp.shape).astype(np.float32)

    base = LayerQuantSpec(weight=QuantSpec(n_bits=8, granularity="channel",
                                           channel_axis=-1))
    metric = make_sensitivity_metric("clip", prompts=["a sample"])
    scores = analysis.sensitivity_scan(
        run_with_resolver, base, ["attn", "mlp"], fp_reference=fp,
        metric_fn=metric)
    assert set(scores) == {"attn", "mlp"}
    assert all(np.isfinite(v) for v in scores.values())
    cfg = analysis.generate_mp_config({"3-0": scores}, high_fraction=0.5)
    assert set(cfg) == {"3-0", "fp_layers"}
    assert set(cfg["3-0"].values()) <= {4, 8}
