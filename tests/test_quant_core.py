"""Unit tests for the functional quantizer core against numpy oracles.

Oracles transliterate the reference semantics (qdiff/quantizer/
base_quantizer.py) in numpy — independent of the JAX implementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from viditq_tpu.quant import core
from viditq_tpu.quant.spec import QuantSpec


# ---------------- numpy oracles (reference semantics) ----------------

def oracle_minmax_qparams(x, axes, n_bits, sym=False, always_zero=False):
    x_min = np.minimum(x.min(axis=axes, keepdims=True), 0.0)
    x_max = np.maximum(x.max(axis=axes, keepdims=True), 0.0)
    if sym:
        n_levels = 2 ** (n_bits - 1) - 1
        delta = np.maximum(np.abs(x_min), np.abs(x_max)) / n_levels
    else:
        n_levels = 2 ** n_bits
        delta = (x_max - x_min) / (n_levels - 1)
    delta = np.maximum(delta, 1e-6)
    if sym or always_zero:
        zp = np.zeros_like(delta)
    else:
        zp = np.round(-x_min / delta)
    return delta, zp


def oracle_fake_quant(x, delta, zp, n_bits, sym=False):
    x_int = np.round(x / delta) + zp
    if sym:
        n_levels = 2 ** (n_bits - 1) - 1
        q = np.clip(x_int, -n_levels - 1, n_levels)
    else:
        q = np.clip(x_int, 0, 2 ** n_bits - 1)
    return (q - zp) * delta


def oracle_grid_search(x, n_bits, n_steps=100):
    """Direct transliteration of base_quantizer.py:230-249 (tensor-wise)."""
    x_min = min(x.min(), 0.0)
    x_max = max(x.max(), 0.0)
    n_levels = 2 ** n_bits
    best = None
    best_loss = np.inf
    for i in range(n_steps):
        s = i / n_steps
        smax, smin = x_max * s, x_min * s
        delta = (smax - smin) / (2 ** n_bits - 1)
        zp = np.round(-smin / (delta + 1e-5))
        x_int = np.round(x / (delta + 1e-4))
        xq = np.clip(x_int + zp, 0, n_levels - 1)
        xdq = (xq - zp) * delta
        loss = np.sum((x - xdq) ** 2)
        if loss < best_loss:
            best_loss = loss
            best = (smax, smin)
    smax, smin = best
    delta = (smax - smin) / (2 ** n_bits - 1)
    zp = np.round(-smin / (delta + 1e-5))
    return delta, zp


# ---------------- tests ----------------

def rand(shape, seed=0, scale=3.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float32)


@pytest.mark.parametrize("gran,axes", [
    ("tensor", (0, 1, 2)),
    ("token", (0, 2)),
    ("channel", (0, 1)),
])
@pytest.mark.parametrize("sym", [False, True])
def test_minmax_qparams_matches_oracle(gran, axes, sym):
    x = rand((4, 16, 32), seed=1)
    spec = QuantSpec(n_bits=8, granularity=gran, sym=sym, channel_axis=-1)
    x_min, x_max = core.minmax(jnp.asarray(x), spec)
    d, z = core.qparams_minmax(x_min, x_max, spec)
    od, oz = oracle_minmax_qparams(x, axes, 8, sym=sym)
    np.testing.assert_allclose(np.asarray(d), od, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z), oz, rtol=0, atol=0)


@pytest.mark.parametrize("n_bits", [4, 6, 8])
@pytest.mark.parametrize("sym", [False, True])
def test_fake_quant_matches_oracle(n_bits, sym):
    x = rand((2, 8, 16), seed=2)
    spec = QuantSpec(n_bits=n_bits, granularity="token", sym=sym)
    x_min, x_max = core.minmax(jnp.asarray(x), spec)
    d, z = core.qparams_minmax(x_min, x_max, spec)
    got = core.fake_quant(jnp.asarray(x), d, z, spec)
    want = oracle_fake_quant(x, np.asarray(d), np.asarray(z), n_bits, sym)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_fake_quant_reconstruction_error_bounded():
    x = rand((4, 128), seed=3)
    spec = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1)
    d, z = core.compute_qparams(jnp.asarray(x), spec)
    xq = core.fake_quant(jnp.asarray(x), d, z, spec)
    # max error <= delta/2 per channel
    err = np.abs(np.asarray(xq) - x)
    assert np.all(err <= np.asarray(d)[0] / 2 + 1e-6)


def test_grid_search_matches_oracle():
    x = rand((64,), seed=4, scale=2.0)
    # add an outlier so shrinkage is actually selected
    x[0] = 40.0
    spec = QuantSpec(n_bits=4, granularity="tensor",
                     scale_method="grid_search_lp")
    xj = jnp.asarray(x)
    x_min, x_max = core.minmax(xj, spec)
    d, z = core.qparams_grid_search(xj, x_min, x_max, spec)
    od, oz = oracle_grid_search(x, 4)
    np.testing.assert_allclose(float(np.squeeze(np.asarray(d))), od, rtol=1e-5)
    assert float(np.squeeze(np.asarray(z))) == oz


def test_round_ste_gradient_is_identity():
    g = jax.grad(lambda v: jnp.sum(core.round_ste(v) ** 2))(jnp.ones((4,)) * 1.3)
    # d/dx (round_ste(x)^2) with STE = 2*round(x) = 2.0
    np.testing.assert_allclose(np.asarray(g), 2.0, rtol=1e-6)


def test_dynamic_equals_compute_then_quant():
    x = rand((2, 16, 8), seed=5)
    spec = QuantSpec(n_bits=8, granularity="token", dynamic=True)
    a = core.fake_quant_dynamic(jnp.asarray(x), spec)
    d, z = core.compute_qparams(jnp.asarray(x), spec)
    b = core.fake_quant(jnp.asarray(x), d, z, spec)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_running_minmax_momentum():
    spec = QuantSpec(n_bits=8, running_stat=True)
    x1 = jnp.asarray(rand((8, 8), seed=6))
    x2 = jnp.asarray(rand((8, 8), seed=7))
    m1, M1 = core.minmax(x1, spec)
    m2, M2 = core.minmax(x2, spec)
    nm, nM = core.update_running_minmax((m1, M1), m2, M2, 0.95,
                                        jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(nm), np.asarray(m1 * 0.95 + m2 * 0.05),
                               rtol=1e-6)
    # uninitialized: takes the new value verbatim
    nm0, _ = core.update_running_minmax((m1, M1), m2, M2, 0.95,
                                        jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(nm0), np.asarray(m2))


def test_mixed_precision_table_roundtrip():
    x = rand((16, 32), seed=8)
    spec = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
                     mixed_precision=(4, 6, 8), timestep_wise=True,
                     n_timestep=3)
    table = core.init_qparams_table(spec, core.group_shape_of(x.shape, spec))
    assert table.delta.shape == (3, 3, 1, 32)
    table = core.calibrate_into_table(table, jnp.asarray(x), spec, t_idx=1)
    # slot 1 is filled for all 3 bitwidths; slots 0/2 remain sentinel -1
    assert np.all(np.asarray(table.delta[:, 1]) > 0)
    assert np.all(np.asarray(table.delta[:, 0]) == -1.0)
    # indexed fake quant at bit_idx=2 (8 bits) == direct 8-bit fake quant
    got = core.fake_quant_indexed(jnp.asarray(x), table, spec,
                                  bit_idx=2, t_idx=1)
    d, z = core.compute_qparams(jnp.asarray(x), spec, n_bits=8)
    want = core.fake_quant(jnp.asarray(x), d, z, spec, n_bits=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    # 4-bit slice quantizes more coarsely
    got4 = core.fake_quant_indexed(jnp.asarray(x), table, spec,
                                   bit_idx=0, t_idx=1,
                                   n_bits_arr=jnp.asarray([4, 6, 8]))
    err8 = np.abs(np.asarray(got) - x).mean()
    err4 = np.abs(np.asarray(got4) - x).mean()
    assert err4 > err8 * 2


def test_adaround_alpha_init_recovers_rest():
    x = rand((8, 8), seed=9)
    delta = jnp.asarray(0.1)
    alpha = core.adaround_init_alpha(jnp.asarray(x), delta)
    soft = core.adaround_soft_targets(alpha)
    rest = x / 0.1 - np.floor(x / 0.1)
    np.testing.assert_allclose(np.asarray(soft), np.clip(rest, 1e-4, 1 - 1e-4),
                               atol=2e-4)


def test_token_granularity_group_shape():
    spec = QuantSpec(granularity="token")
    assert core.group_shape_of((2, 100, 64), spec) == (1, 100, 1)
    spec = QuantSpec(granularity="channel", channel_axis=-1)
    assert core.group_shape_of((128, 64), spec) == (1, 64)


def test_with_bits_rejects_uncalibrated_bitwidth():
    """Switching a static quantizer to a bitwidth outside its calibrated
    bits_tuple must fail loudly (round-1 VERDICT: silent-wrong-scale trap)."""
    import pytest
    from viditq_tpu.quant.spec import QuantSpec

    s8 = QuantSpec(n_bits=8, granularity="channel", round_mode="nearest")
    with pytest.raises(ValueError, match="calibrated"):
        s8.with_bits(4)
    # member of the mixed-precision tuple: fine
    mp = QuantSpec(n_bits=8, granularity="channel", round_mode="nearest",
                   mixed_precision=(4, 8))
    assert mp.with_bits(4).bit_idx == 0
    # dynamic quantizers compute qparams online: any bits allowed
    dyn = QuantSpec(n_bits=8, granularity="token", dynamic=True)
    assert dyn.with_bits(6).n_bits == 6


def test_split_rejects_smooth_quant():
    import dataclasses
    import pytest
    from viditq_tpu.quant.spec import LayerQuantSpec, SmoothQuantSpec

    with pytest.raises(ValueError, match="split"):
        LayerQuantSpec(split=96,
                       smooth_quant=SmoothQuantSpec(enable=True))
