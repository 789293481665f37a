"""Quality metric tests."""

import numpy as np

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
