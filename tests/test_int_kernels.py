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


def _ref_linear(x, packed, sym):
    from viditq_tpu.kernels.int_matmul import (dynamic_quant_rows_ref,
                                               int8_matmul_ref)
    xq, xs, xzp, xrs = dynamic_quant_rows_ref(x, sym=sym)
    return int8_matmul_ref(xq, packed["w_q"], xs, xzp, xrs,
                           packed["w_scale"], packed["w_zp"],
                           packed["w_colsum"], out_dtype=jnp.float32)


@pytest.mark.parametrize("sym,sym_w", [(True, True), (True, False),
                                       (False, True), (False, False)])
def test_fused_dynq_matmul_parity(sym, sym_w):
    """fused quantize-in kernel == dynq_ref + int8_matmul_ref for every
    act/weight symmetry combination (the correction-dropping fast paths)."""
    from viditq_tpu.kernels.fused_matmul import fused_dynq_int8_matmul
    from viditq_tpu.kernels.int_matmul import pack_weight
    rng = np.random.default_rng(0)
    M, K, N = 64, 256, 128
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
    if sym_w:
        wd = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
        wz = jnp.zeros_like(wd)
    else:
        wd = (jnp.max(w, 0, keepdims=True) - jnp.min(w, 0, keepdims=True)) / 255.0
        wz = jnp.round(-jnp.min(w, 0, keepdims=True) / wd)
    packed = pack_weight(w, wd, wz, sym=sym_w)
    bias = jnp.asarray(rng.standard_normal((N,)), jnp.float32)
    want = _ref_linear(x, packed, sym) + bias
    with pltpu.force_tpu_interpret_mode():
        got = fused_dynq_int8_matmul(
            x, packed["w_q"], packed["w_scale"], packed["w_zp"],
            packed["w_colsum"], sym=sym, sym_w=sym_w, bias=bias,
            out_dtype=jnp.float32, block_m=32, block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("sym,sym_w,n_k", [(True, True, 2), (True, False, 1),
                                           (False, True, 2),
                                           (False, False, 2)])
def test_consumer_matmul_parity(sym, sym_w, n_k):
    """int8_consumer_matmul (incl. K-splitting) == reference epilogue."""
    from viditq_tpu.kernels.fused_matmul import (int8_consumer_matmul,
                                                 quantize_rows_fused)
    from viditq_tpu.kernels.int_matmul import (dynamic_quant_rows_ref,
                                               int8_matmul_ref, pack_weight)
    rng = np.random.default_rng(1)
    M, K, N = 64, 256, 128
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
    if sym_w:
        wd = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
        wz = jnp.zeros_like(wd)
    else:
        wd = (jnp.max(w, 0, keepdims=True) - jnp.min(w, 0, keepdims=True)) / 255.0
        wz = jnp.round(-jnp.min(w, 0, keepdims=True) / wd)
    packed = pack_weight(w, wd, wz, sym=sym_w)
    xq, xs, xzp, xrs = dynamic_quant_rows_ref(x, sym=sym)
    want = int8_matmul_ref(xq, packed["w_q"], xs, xzp, xrs,
                           packed["w_scale"], packed["w_zp"],
                           packed["w_colsum"], out_dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = int8_consumer_matmul(
            xq, xs,
            packed["w_q"], packed["w_scale"],
            x_zp=None if sym else xzp,
            x_rowsum=xrs,
            w_zp=None if sym_w else packed["w_zp"],
            w_colsum=packed["w_colsum"],
            out_dtype=jnp.float32, block_m=32, block_n=128,
            block_k=K // n_k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("sym", [True, False])
def test_quantize_rows_fused_gelu(sym):
    """gelu+quantize producer pass == approx_gelu then dynq_ref."""
    from viditq_tpu.kernels.fused_matmul import quantize_rows_fused
    from viditq_tpu.kernels.int_matmul import dynamic_quant_rows_ref
    from viditq_tpu.models.layers import approx_gelu
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((48, 256)) * 2, jnp.float32)
    want = dynamic_quant_rows_ref(approx_gelu(x).astype(jnp.float32), sym=sym)
    with pltpu.force_tpu_interpret_mode():
        got = quantize_rows_fused(x, sym=sym, gelu=True, block_m=16)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=1e-5)
    if not sym:
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]))
    np.testing.assert_allclose(np.asarray(got[3]), np.asarray(want[3]))


def _sym_pack(w):
    from viditq_tpu.kernels.int_matmul import pack_weight
    wd = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    return pack_weight(w, wd, jnp.zeros_like(wd), sym=True)


def test_consumer_emit_gelu_parity():
    """int8-emitting consumer epilogue (fc1 -> gelu -> tile row-quantize)
    == the explicit chain: consumer matmul, approx_gelu, col_scale,
    group-wise sym quantize (one scale per [row x block_n] tile)."""
    from viditq_tpu.kernels.fused_matmul import int8_consumer_matmul
    from viditq_tpu.kernels.int_matmul import (dynamic_quant_rows_ref,
                                               int8_matmul_ref)
    from viditq_tpu.models.layers import approx_gelu
    rng = np.random.default_rng(3)
    M, K, N, BN = 64, 256, 256, 128
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((N,)) * 0.1, jnp.float32)
    cs = jnp.asarray(rng.uniform(0.5, 2.0, (N,)), jnp.float32)
    packed = _sym_pack(w)
    xq, xs, _, _ = dynamic_quant_rows_ref(x, sym=True)
    out = int8_matmul_ref(xq, packed["w_q"], xs, jnp.zeros_like(xs),
                          jnp.zeros_like(xs), packed["w_scale"],
                          packed["w_zp"], packed["w_colsum"],
                          out_dtype=jnp.float32) + bias
    out = approx_gelu(out).astype(jnp.float32) * cs[None, :]
    # group-wise oracle: per-row sym quantize of each BN-wide tile
    G = N // BN
    og = out.reshape(M, G, BN)
    sc = jnp.maximum(jnp.max(jnp.abs(og), axis=-1) / 127.0, 1e-6)  # [M, G]
    codes_want = jnp.clip(jnp.round(og / sc[..., None]), -128,
                          127).reshape(M, N)
    with pltpu.force_tpu_interpret_mode():
        codes, scales = int8_consumer_matmul(
            xq, xs, packed["w_q"], packed["w_scale"], bias=bias,
            block_m=32, block_n=BN, emit={"gelu": True, "col_scale": cs})
    # scales use the lane-padded [M, G*128] layout (scale broadcast
    # across each group's 128-lane tile)
    assert codes.shape == (M, N) and scales.shape == (M, G * 128)
    np.testing.assert_allclose(np.asarray(scales[:, ::128]),
                               np.asarray(sc), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scales[:, 5::128]),
                               np.asarray(sc), rtol=1e-5)
    # the kernel computes gelu in a different op order than XLA; allow
    # off-by-one codes at tile boundaries of the rounding
    diff = np.abs(np.asarray(codes, np.int32)
                  - np.asarray(codes_want, np.int32))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.01, diff.max()


def test_consumer_groupwise_scale_parity():
    """Group-wise x_scale consumption (emitted codes in) == f32 oracle:
    each k-block's partial sum dequantized by its group scale."""
    from viditq_tpu.kernels.fused_matmul import int8_consumer_matmul
    rng = np.random.default_rng(4)
    M, K, N, G = 48, 256, 128, 2
    codes = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    scales = jnp.asarray(rng.uniform(0.005, 0.05, (M, G)), jnp.float32)
    scales_padded = jnp.repeat(scales, 128, axis=1)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
    packed = _sym_pack(w)
    bias = jnp.asarray(rng.standard_normal((N,)) * 0.1, jnp.float32)
    cf = codes.astype(jnp.float32).reshape(M, G, K // G)
    wf = (packed["w_q"].astype(jnp.float32)
          * packed["w_scale"].reshape(1, -1))
    part = jnp.einsum("mgk,gkn->mgn", cf,
                      wf.reshape(G, K // G, N))
    want = jnp.sum(part * scales[..., None], axis=1) + bias
    with pltpu.force_tpu_interpret_mode():
        got = int8_consumer_matmul(codes, scales_padded, packed["w_q"],
                                   packed["w_scale"], bias=bias,
                                   out_dtype=jnp.float32,
                                   block_m=16, block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_mlp_fc1_emission_model_parity(monkeypatch):
    """Mlp with VIDITQ_EMIT_FC1: fc1's int8-emitting epilogue feeds fc2's
    group-wise consumer. Must track the separate-producer path within
    quantization noise (group scales are FINER than per-token, so the
    emission path may only be more accurate, not less)."""
    import dataclasses
    from jax.experimental.pallas import tpu as pltpu
    from viditq_tpu.models.layers import Mlp
    from viditq_tpu.quant.spec import LayerQuantSpec, QuantSpec
    from viditq_tpu.quant.qlinear import QuantCtx
    from viditq_tpu.quant.calibrate import calibrate_weight_tables
    from viditq_tpu.quant.native_pack import pack_native_weights

    monkeypatch.setenv("VIDITQ_FORCE_FUSED", "1")
    W = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
                  sym=True)
    A = QuantSpec(n_bits=8, granularity="token", dynamic=True, sym=True)
    spec = LayerQuantSpec(weight=W, act=A, backend="native", impl="fused")
    res = lambda n: spec
    rng = np.random.default_rng(5)
    C, H = 64, 256
    x = jnp.asarray(rng.standard_normal((2, 24, C)), jnp.float32)
    mlp = Mlp(hidden_features=H, out_features=C, resolver=res, prefix="mlp",
              dtype=jnp.float32)
    vs = dict(mlp.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp")))
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"], res)
    vs["quant"] = pack_native_weights(vs["params"], vs["quant"], res)
    fp = mlp.apply(vs, x, QuantCtx(mode="fp"))
    pre = dynamic_quant_rows_ref(x.reshape(-1, C), sym=True)
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("VIDITQ_EMIT_FC1", "0")
        out_prod = mlp.apply(vs, x, QuantCtx(mode="quant"), prequant=pre)
        monkeypatch.setenv("VIDITQ_EMIT_FC1", "1")
        out_emit = mlp.apply(vs, x, QuantCtx(mode="quant"), prequant=pre)

    def rel(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return np.linalg.norm(a - b) / np.linalg.norm(b)

    r_prod = rel(out_prod, fp)
    r_emit = rel(out_emit, fp)
    assert r_emit < max(r_prod * 1.25, 0.02), (r_emit, r_prod)
    assert rel(out_emit, out_prod) < 0.02
