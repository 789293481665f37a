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
