"""ln_modulate_quantize kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from viditq_tpu.kernels.fused_matmul import ln_modulate_quantize


def _reference(x, shift, scale, sym, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * (1.0 + scale.astype(jnp.float32)) + shift.astype(jnp.float32)
    y = y.reshape(-1, y.shape[-1])
    if sym:
        s = jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0
        q = jnp.clip(jnp.round(y / s), -128, 127)
        return q, s
    mn = jnp.min(y, axis=-1, keepdims=True)
    mx = jnp.max(y, axis=-1, keepdims=True)
    s = (mx - mn) / 255.0
    zp = jnp.round(-mn / s)
    q = jnp.clip(jnp.round(y / s) + zp, 0, 255) - 128
    return q, s


def test_ln_modulate_quantize_matches_reference():
    rng = np.random.default_rng(0)
    B, N, C = 2, 512, 128
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    shift = jnp.asarray(rng.standard_normal((B, 1, C)) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.standard_normal((B, 1, C)) * 0.2, jnp.float32)
    for sym in (True, False):
        with pltpu.force_tpu_interpret_mode():
            q, xs, xzp, xrs = ln_modulate_quantize(x, shift, scale, sym=sym)
        want_q, want_s = _reference(x, shift, scale, sym)
        got = np.asarray(q, np.int32)
        want = np.asarray(want_q, np.int32)
        # rounding ties may flip codes by 1 LSB on a few entries
        assert (np.abs(got - want) <= 1).all()
        assert (got == want).mean() > 0.999
        np.testing.assert_allclose(np.asarray(xs), np.asarray(want_s),
                                   rtol=1e-5)
        assert np.asarray(xrs).shape == (B * N, 1)
        # dequantized values reproduce the modulated LN output
        if sym:
            deq = got * np.asarray(want_s)
        else:
            deq = (got + 128 - np.asarray(xzp) - 128) * np.asarray(want_s)
    # rowsum consistency
    with pltpu.force_tpu_interpret_mode():
        q, xs, _, xrs = ln_modulate_quantize(x, shift, scale, sym=True)
    np.testing.assert_allclose(
        np.asarray(q, np.float32).sum(-1, keepdims=True), np.asarray(xrs),
        rtol=1e-5)


def test_matmul_residual_gate_epilogue():
    """Fused residual(+gate) epilogue == external res + gate * (x @ w_deq)
    for both int8 matmul kernels (interpret mode)."""
    from viditq_tpu.kernels.fused_matmul import (fused_dynq_int8_matmul,
                                                 int8_consumer_matmul,
                                                 quantize_rows_fused)
    rng = np.random.default_rng(1)
    M, K, C = 512, 128, 128
    G = 2
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    wf = jnp.asarray(rng.standard_normal((K, C)) * 0.05, jnp.float32)
    ws = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    wq = jnp.clip(jnp.round(wf / ws), -128, 127).astype(jnp.int8)
    bias = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    res = jnp.asarray(rng.standard_normal((M, C)), jnp.float32)
    gate = jnp.asarray(rng.standard_normal((G, C)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        plain = fused_dynq_int8_matmul(
            x, wq, ws, jnp.zeros((1, C)), jnp.zeros((1, C)), sym=True,
            sym_w=True, bias=bias, out_dtype=jnp.float32)
        fused = fused_dynq_int8_matmul(
            x, wq, ws, jnp.zeros((1, C)), jnp.zeros((1, C)), sym=True,
            sym_w=True, bias=bias, out_dtype=jnp.float32,
            residual=res, gate=gate)
    want = np.asarray(res) + np.kron(np.asarray(gate),
                                     np.ones((M // G, 1))) * np.asarray(plain)
    np.testing.assert_allclose(np.asarray(fused), want, rtol=2e-4, atol=2e-4)

    # consumer kernel path (pre-quantized input), residual only
    with pltpu.force_tpu_interpret_mode():
        xq, xs, _, xrs = quantize_rows_fused(x, sym=True)
        plain_c = int8_consumer_matmul(xq, xs, wq, ws, bias=bias,
                                       out_dtype=jnp.float32)
        fused_c = int8_consumer_matmul(xq, xs, wq, ws, bias=bias,
                                       out_dtype=jnp.float32, residual=res)
    np.testing.assert_allclose(np.asarray(fused_c),
                               np.asarray(res) + np.asarray(plain_c),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.heavy
def test_stdit_block_epilogue_fallback_matches_external_add():
    """On the non-fused (CPU/simulate) path the epilogue applies in XLA —
    the block must equal the round-start external-residual math."""
    import dataclasses
    from viditq_tpu.models.stdit import STDiTBlock
    from viditq_tpu.quant import (LayerQuantSpec, QuantSpec, QuantCtx,
                                  calibrate_weight_tables)
    W8 = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
                   round_mode="nearest")
    A8 = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
                   dynamic=True)
    lspec = LayerQuantSpec(weight=W8, act=A8)
    resolver = lambda n: lspec  # noqa: E731
    block = STDiTBlock(hidden_size=32, num_heads=4, d_s=16, d_t=2,
                       resolver=resolver, prefix="b", dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 4, 32)), jnp.float32)
    t0 = jnp.asarray(rng.standard_normal((2, 192)) * 0.1, jnp.float32)
    vs = dict(block.init(jax.random.PRNGKey(0), x, y, t0,
                         qctx=QuantCtx(mode="fp")))
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"],
                                          resolver)
    out_fp = block.apply(vs, x, y, t0, qctx=QuantCtx(mode="fp"))
    out_q = block.apply(vs, x, y, t0, qctx=QuantCtx(mode="quant"))
    assert np.isfinite(np.asarray(out_q)).all()
    rel = (np.linalg.norm(np.asarray(out_q - out_fp))
           / np.linalg.norm(np.asarray(out_fp)))
    assert 0 < rel < 0.05, rel
