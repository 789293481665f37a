"""Layout-native attention kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from viditq_tpu.kernels.attention import attention_bnhd
from viditq_tpu.models.layers import sdpa_xla

RNG = np.random.default_rng(0)


def _mk(b, n, h, d, scale=1.0):
    return jnp.asarray(RNG.standard_normal((b, n, h, d)) * scale,
                       jnp.float32)


def test_full_attention_matches_sdpa():
    B, N, H, D = 2, 256, 4, 72
    q, k, v = _mk(B, N, H, D), _mk(B, N, H, D), _mk(B, N, H, D)
    want = sdpa_xla(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), scale=D ** -0.5
                    ).transpose(0, 2, 1, 3)
    with pltpu.force_tpu_interpret_mode():
        got = attention_bnhd(q, k, v, scale=D ** -0.5, block_q=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)  # bf16 QK^T


def test_segment_attention_matches_per_segment_sdpa():
    """seg_len mode == independent attention per segment (STDiT temporal)."""
    B, N, H, D, seg = 2, 128, 4, 16, 16
    q, k, v = _mk(B, N, H, D), _mk(B, N, H, D), _mk(B, N, H, D)
    G = N // seg
    def per_seg(t):
        return t.reshape(B * G, seg, H, D).transpose(0, 2, 1, 3)
    want = sdpa_xla(per_seg(q), per_seg(k), per_seg(v), scale=D ** -0.5)
    want = want.transpose(0, 2, 1, 3).reshape(B, N, H, D)
    with pltpu.force_tpu_interpret_mode():
        got = attention_bnhd(q, k, v, scale=D ** -0.5, seg_len=seg,
                             block_q=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_cross_attention_with_kv_mask():
    """separate kv length + padding mask == additive -inf bias sdpa."""
    B, N, M, H, D = 2, 256, 24, 4, 16
    q = _mk(B, N, H, D)
    k, v = _mk(B, M, H, D), _mk(B, M, H, D)
    mask = jnp.asarray(RNG.integers(0, 2, (B, M)), jnp.int32)
    mask = mask.at[:, 0].set(1)  # at least one valid key per row
    bias = jnp.where(mask[:, None, None, :] != 0, 0.0, -jnp.inf)
    want = sdpa_xla(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), scale=D ** -0.5, bias=bias
                    ).transpose(0, 2, 1, 3)
    with pltpu.force_tpu_interpret_mode():
        got = attention_bnhd(q, k, v, scale=D ** -0.5, kv_mask=mask,
                             block_q=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_attention_bnhd_differentiable():
    """custom_vjp backward (XLA recompute) matches grads of the XLA
    reference — block recon / QAT differentiate through the attention."""
    from viditq_tpu.kernels.attention import attention_bnhd_xla
    rng = np.random.default_rng(3)
    B, N, H, D = 2, 128, 2, 16
    q = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)

    def loss_pallas(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(attention_bnhd(q, k, v, scale=D ** -0.5,
                                          block_q=128) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(attention_bnhd_xla(q, k, v, scale=D ** -0.5) ** 2)

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    # the kernel's forward is bf16 on the MXU (~3e-3 output noise), so the
    # cotangents differ slightly; require tight directional agreement
    for gp, gx in zip(g_pallas, g_xla):
        gp, gx = np.asarray(gp).ravel(), np.asarray(gx).ravel()
        cos = gp @ gx / (np.linalg.norm(gp) * np.linalg.norm(gx))
        assert cos > 0.9995, cos
        np.testing.assert_allclose(gp, gx, atol=5e-2)
    # segment mode grads too
    def loss_seg(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(attention_bnhd(q, k, v, scale=D ** -0.5,
                                          seg_len=16) ** 2)
    g_seg = jax.grad(loss_seg)(q, k, v)
    assert np.isfinite(np.asarray(g_seg)).all()


@pytest.mark.parametrize("int8_qk,int8_pv", [(False, True), (True, False),
                                             (True, True)])
def test_int8_attention_matches_oracle(int8_qk, int8_pv):
    """Real-exec attention-internal quantizers (int8 QK^T / softmax int8 PV)
    match the XLA oracle of the same quantization math and stay within 8-bit
    error of fp attention."""
    from viditq_tpu.kernels.attention import (attention_bnhd_xla,
                                              attention_bnhd_xla_quant)
    rng = np.random.default_rng(7)
    B, N, H, D = 1, 128, 2, 72
    mk = lambda n: jnp.asarray(rng.standard_normal((B, n, H, D)), jnp.float32)
    q, k, v = mk(N), mk(N), mk(N)
    want = attention_bnhd_xla_quant(q, k, v, D ** -0.5,
                                    int8_qk=int8_qk, int8_pv=int8_pv)
    with pltpu.force_tpu_interpret_mode():
        got = attention_bnhd(q, k, v, D ** -0.5, block_q=128,
                             int8_qk=int8_qk, int8_pv=int8_pv)
    err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert err < 0.01, err
    fp = attention_bnhd_xla(q, k, v, D ** -0.5)
    err_fp = float(jnp.linalg.norm(got - fp) / jnp.linalg.norm(fp))
    assert err_fp < 0.03, err_fp  # 8-bit quantization noise bound


def test_int8_attention_seg_and_mask():
    from viditq_tpu.kernels.attention import attention_bnhd_xla_quant
    rng = np.random.default_rng(8)
    B, N, H, D = 1, 128, 2, 72
    mk = lambda n: jnp.asarray(rng.standard_normal((B, n, H, D)), jnp.float32)
    q, k, v = mk(N), mk(N), mk(N)
    with pltpu.force_tpu_interpret_mode():
        gs = attention_bnhd(q, k, v, D ** -0.5, seg_len=16, block_q=64,
                            int8_qk=True, int8_pv=True)
    ws = attention_bnhd_xla_quant(q, k, v, D ** -0.5, seg_len=16,
                                  int8_qk=True, int8_pv=True, v_block=64)
    assert float(jnp.linalg.norm(gs - ws) / jnp.linalg.norm(ws)) < 0.01
    km, vm = mk(24), mk(24)
    mask = jnp.asarray(rng.integers(0, 2, (B, 24)), jnp.int32).at[:, 0].set(1)
    with pltpu.force_tpu_interpret_mode():
        gm = attention_bnhd(q, km, vm, D ** -0.5, kv_mask=mask, block_q=128,
                            int8_pv=True)
    wm = attention_bnhd_xla_quant(q, km, vm, D ** -0.5, kv_mask=mask,
                                  int8_pv=True)
    assert float(jnp.linalg.norm(gm - wm) / jnp.linalg.norm(wm)) < 0.01


@pytest.mark.heavy
def test_streaming_kernel_matches_oneshot_math():
    """M > ONESHOT_MAX_M dispatches the kv-streaming online-softmax kernel;
    outputs must match the XLA oracle in every mode (bf16, masked cross,
    int8 PV, int8 emission with col_scale)."""
    from viditq_tpu.kernels.attention import (ONESHOT_MAX_M,
                                              attention_bnhd_int8out,
                                              attention_bnhd_xla,
                                              attention_bnhd_xla_quant)
    rng = np.random.default_rng(11)
    B, H, D = 1, 2, 72
    C = H * D
    N, M = 256, ONESHOT_MAX_M + 256   # cross shape, bkv=256 -> 9 kv steps
    mk = lambda n: jnp.asarray(rng.standard_normal((B, n, H, D)),
                               jnp.float32)
    q, k, v = mk(N), mk(M), mk(M)
    want = attention_bnhd_xla(q, k, v, D ** -0.5)
    with pltpu.force_tpu_interpret_mode():
        got = attention_bnhd(q, k, v, D ** -0.5)
    err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert err < 2e-2, err  # bf16 MXU dots vs f32 oracle
    # padding mask (fully-masked later kv blocks exercise the -inf guard)
    mask = jnp.zeros((B, M), jnp.int32).at[:, :300].set(1)
    want_m = attention_bnhd_xla(q, k, v, D ** -0.5, kv_mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got_m = attention_bnhd(q, k, v, D ** -0.5, kv_mask=mask)
    err_m = float(jnp.linalg.norm(got_m - want_m)
                  / jnp.linalg.norm(want_m))
    assert err_m < 3e-2, err_m  # bf16 QK noise; exactness vs the one-shot
    # kernel (same bf16 dots) is asserted below
    import viditq_tpu.kernels.attention as attn_mod
    k1, v1 = mk(1024), mk(1024)
    mask1 = jnp.zeros((B, 1024), jnp.int32).at[:, :300].set(1)
    with pltpu.force_tpu_interpret_mode():
        one = attention_bnhd(q, k1, v1, D ** -0.5, kv_mask=mask1)
        old = attn_mod.ONESHOT_MAX_M
        attn_mod.ONESHOT_MAX_M = 512  # force the streaming dispatch
        try:
            strm = attention_bnhd(q, k1, v1, D ** -0.5, kv_mask=mask1)
        finally:
            attn_mod.ONESHOT_MAX_M = old
    err_x = float(jnp.linalg.norm(strm - one) / jnp.linalg.norm(one))
    assert err_x < 2e-3, err_x  # identical bf16 dots, online vs one-shot
    # int8 PV (per-channel v quantized over the full token axis). The
    # streaming codes quantize against the RUNNING max (kernel comment) —
    # near the oracle, and no worse vs fp than the oracle itself is.
    with pltpu.force_tpu_interpret_mode():
        got_pv = attention_bnhd(q, k, v, D ** -0.5, int8_pv=True)
    want_pv = attention_bnhd_xla_quant(q, k, v, D ** -0.5, int8_pv=True)
    err_pv = float(jnp.linalg.norm(got_pv - want_pv)
                   / jnp.linalg.norm(want_pv))
    assert err_pv < 4e-2, err_pv
    err_pv_fp = float(jnp.linalg.norm(got_pv - want)
                      / jnp.linalg.norm(want))
    oracle_fp = float(jnp.linalg.norm(want_pv - want)
                      / jnp.linalg.norm(want))
    assert err_pv_fp < oracle_fp * 1.5 + 1e-3, (err_pv_fp, oracle_fp)
    # int8 emission + smooth-quant col_scale fold
    ocs = jnp.asarray(rng.uniform(0.5, 2.0, (C,)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        codes, scales, zp, rs = attention_bnhd_int8out(
            q, k, v, D ** -0.5, need_rowsum=True, col_scale=ocs)
    assert zp is None
    deq = codes.astype(jnp.float32) * scales
    ref = want.reshape(B, N, C) * ocs.reshape(1, 1, C)
    err_e = float(jnp.linalg.norm(deq - ref) / jnp.linalg.norm(ref))
    assert err_e < 2.5e-2, err_e
    np.testing.assert_allclose(
        np.asarray(rs[..., 0]),
        np.asarray(jnp.sum(codes.astype(jnp.float32), axis=-1)), atol=0.5)


def test_int8out_emission_matches_quantized_output():
    """attention_bnhd_int8out's (codes, scales) dequantize to the regular
    kernel output; rowsum matches the code sum."""
    from viditq_tpu.kernels.attention import attention_bnhd_int8out
    rng = np.random.default_rng(9)
    B, N, H, D = 1, 128, 2, 72
    C = H * D
    mk = lambda n: jnp.asarray(rng.standard_normal((B, n, H, D)), jnp.float32)
    q, k, v = mk(N), mk(N), mk(N)
    with pltpu.force_tpu_interpret_mode():
        ref = attention_bnhd(q, k, v, D ** -0.5, block_q=128)
        codes, scales, zp, rowsum = attention_bnhd_int8out(
            q, k, v, D ** -0.5, block_q=128, need_rowsum=True)
    assert zp is None
    deq = codes.astype(jnp.float32) * scales
    ref2 = ref.reshape(B, N, C)
    err = float(jnp.linalg.norm(deq - ref2) / jnp.linalg.norm(ref2))
    assert err < 0.01, err  # 8-bit row quantization of the output
    np.testing.assert_allclose(
        np.asarray(rowsum[..., 0]),
        np.asarray(jnp.sum(codes.astype(jnp.float32), axis=-1)), atol=0.5)
    # int8_pv composes with emission
    with pltpu.force_tpu_interpret_mode():
        codes2, scales2, zp2, rs2 = attention_bnhd_int8out(
            q, k, v, D ** -0.5, block_q=128, int8_pv=True)
    assert rs2 is None and zp2 is None
    deq2 = codes2.astype(jnp.float32) * scales2
    err2 = float(jnp.linalg.norm(deq2 - ref2) / jnp.linalg.norm(ref2))
    assert err2 < 0.03, err2
    # asymmetric emission (reference dynamic per-token semantics)
    with pltpu.force_tpu_interpret_mode():
        codes3, scales3, zp3, rs3 = attention_bnhd_int8out(
            q, k, v, D ** -0.5, block_q=128, emit_sym=False,
            need_rowsum=True)
    assert zp3 is not None and rs3 is not None
    deq3 = (codes3.astype(jnp.float32) - zp3) * scales3
    err3 = float(jnp.linalg.norm(deq3 - ref2) / jnp.linalg.norm(ref2))
    assert err3 < 0.01, err3
    # smooth-quant col_scale fold: the emitted codes quantize the RESCALED
    # output (of * 1/cs) — the consuming CB proj's act-side semantics
    ocs = jnp.asarray(rng.uniform(0.5, 2.0, (C,)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        codes4, scales4, zp4, rs4 = attention_bnhd_int8out(
            q, k, v, D ** -0.5, block_q=128, need_rowsum=True,
            col_scale=ocs)
    deq4 = codes4.astype(jnp.float32) * scales4
    ref4 = ref2 * ocs.reshape(1, 1, C)
    err4 = float(jnp.linalg.norm(deq4 - ref4) / jnp.linalg.norm(ref4))
    assert err4 < 0.01, err4
    np.testing.assert_allclose(
        np.asarray(rs4[..., 0]),
        np.asarray(jnp.sum(codes4.astype(jnp.float32), axis=-1)), atol=0.5)
