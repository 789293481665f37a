"""Pallas int8 kernel parity tests (interpret mode on CPU; the same code
compiles for TPU). Parity target: the fake-quant path IS the semantics
(SURVEY §7 item 2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from viditq_tpu.kernels.int_matmul import (
    dynamic_quant_rows, dynamic_quant_rows_ref, int8_matmul, int8_matmul_ref,
    pack_weight, quantized_linear_native)
from viditq_tpu.quant import core
from viditq_tpu.quant.spec import QuantSpec


def rand(shape, seed=0, scale=2.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)


@pytest.mark.parametrize("sym", [False, True])
def test_dynamic_quant_rows_matches_ref(sym):
    x = rand((64, 256), seed=1)
    with pltpu.force_tpu_interpret_mode():
        q, s, z, rs = dynamic_quant_rows(x, sym=sym)
    qr, sr, zr, rsr = dynamic_quant_rows_ref(x, sym=sym)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(qr))
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(zr))
    np.testing.assert_array_equal(np.asarray(rs), np.asarray(rsr))


def test_int8_matmul_matches_ref():
    rng = np.random.default_rng(2)
    M, K, N = 96, 384, 256
    x_q = jnp.asarray(rng.integers(-128, 128, (M, K)), jnp.int8)
    w_q = jnp.asarray(rng.integers(-128, 128, (K, N)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.01, 0.1, (M, 1)), jnp.float32)
    xzp = jnp.asarray(rng.integers(-20, 20, (M, 1)), jnp.float32)
    xrs = jnp.sum(x_q.astype(jnp.float32), axis=1, keepdims=True)
    ws = jnp.asarray(rng.uniform(0.01, 0.1, (1, N)), jnp.float32)
    wzp = jnp.asarray(rng.integers(-20, 20, (1, N)), jnp.float32)
    wcs = jnp.sum(w_q.astype(jnp.float32), axis=0, keepdims=True)
    with pltpu.force_tpu_interpret_mode():
        got = int8_matmul(x_q, w_q, xs, xzp, xrs, ws, wzp, wcs,
                          out_dtype=jnp.float32, block_m=32, block_n=128,
                          block_k=128)
    want = int8_matmul_ref(x_q, w_q, xs, xzp, xrs, ws, wzp, wcs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-3)


def test_native_linear_matches_fake_quant():
    """int8 kernel path == fake-quant simulation (the reference semantics)."""
    x = rand((32, 128), seed=3)
    w = rand((128, 64), seed=4, scale=0.2)
    wspec = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
                      round_mode="nearest")
    aspec = QuantSpec(n_bits=8, granularity="token", round_mode="nearest",
                      dynamic=True)
    # fake-quant path
    wd, wz = core.compute_qparams(w, wspec)
    w_fq = core.fake_quant(w, wd, wz, wspec)
    x_fq = core.fake_quant_dynamic(x[None], aspec)[0]  # [1,M,K] token view
    want = x_fq @ w_fq
    # native path
    packed = pack_weight(w, wd, wz, n_bits=8)
    with pltpu.force_tpu_interpret_mode():
        got = quantized_linear_native(x, packed, act_sym=False,
                                      out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)


def test_native_linear_odd_shapes():
    """Non-multiple-of-block dims must still be exact (padding path)."""
    x = rand((19, 72), seed=5)
    w = rand((72, 40), seed=6, scale=0.3)
    wspec = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
                      round_mode="nearest")
    wd, wz = core.compute_qparams(w, wspec)
    packed = pack_weight(w, wd, wz)
    w_fq = core.fake_quant(w, wd, wz, wspec)
    aspec = QuantSpec(n_bits=8, granularity="token", round_mode="nearest",
                      dynamic=True)
    x_fq = core.fake_quant_dynamic(x[None], aspec)[0]
    with pltpu.force_tpu_interpret_mode():
        got = quantized_linear_native(x, packed, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x_fq @ w_fq),
                               rtol=1e-4, atol=1e-3)


def test_pack_weight_int4():
    w = rand((64, 32), seed=7, scale=0.3)
    wspec = QuantSpec(n_bits=4, granularity="channel", channel_axis=-1,
                      round_mode="nearest")
    wd, wz = core.compute_qparams(w, wspec)
    packed = pack_weight(w, wd, wz, n_bits=4)
    # codes fit in [-8, 7]
    assert packed["w_q"].min() >= -8 and packed["w_q"].max() <= 7
    w_fq = core.fake_quant(w, wd, wz, wspec)
    # dequant of packed == fake quant
    deq = ((packed["w_q"].astype(np.float32) - packed["w_zp"])
           * packed["w_scale"])
    np.testing.assert_allclose(deq, np.asarray(w_fq), rtol=1e-4, atol=1e-5)
