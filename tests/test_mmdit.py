"""MMDiT (stretch config): forward, W4A8 quantized, rectified-flow sampling."""

import numpy as np
import jax
import jax.numpy as jnp

from viditq_tpu.models.mmdit import MMDiT, rectified_flow_sample
import pytest

from viditq_tpu.quant import (
    LayerQuantSpec, QuantSpec, QuantCtx, calibrate_weight_tables,
    resolve_layer_spec)

pytestmark = pytest.mark.heavy

W4 = QuantSpec(n_bits=4, granularity="channel", channel_axis=-1,
               round_mode="nearest")
A8 = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
               dynamic=True)
FP = ("x_embedder", "t_embedder", "y_embedder", "context_embedder",
      "final_linear", "final_adaLN")


def resolver(name):
    return resolve_layer_spec(name, LayerQuantSpec(weight=W4, act=A8), FP)


def tiny():
    return MMDiT(input_size=8, patch_size=2, in_channels=4, hidden_size=64,
                 depth=2, num_heads=4, caption_channels=32,
                 pooled_channels=16, model_max_length=8, dtype=jnp.float32,
                 resolver=resolver)


def test_mmdit_quantized_forward_and_sampling():
    model = tiny()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([500.0, 100.0])
    y = jnp.asarray(rng.standard_normal((2, 1, 8, 32)), jnp.float32)
    mask = jnp.ones((2, 8), jnp.int32)
    variables = dict(model.init(jax.random.PRNGKey(0), x, t, y, mask, None,
                                QuantCtx(mode="fp")))
    out = model.apply(variables, x, t, y, mask, None, QuantCtx(mode="fp"))
    assert out.shape == (2, 4, 8, 8)

    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolver)
    qv = variables["quant"]
    assert "w_delta" in qv["blocks_0"]["img_attn"]["q"]
    assert "w_delta" in qv["blocks_0"]["txt_mlp"]["fc1"]
    out_q = model.apply(variables, x, t, y, mask, None,
                        QuantCtx(mode="quant", t_id=jnp.asarray(500)))
    assert np.isfinite(np.asarray(out_q)).all()
    rel = (np.linalg.norm(np.asarray(out_q - out))
           / np.linalg.norm(np.asarray(out)))
    assert 0 < rel < 0.6, rel  # W4 on random weights is coarse

    # rectified-flow sampling with CFG, quantized, jitted end to end
    z = jnp.asarray(rng.standard_normal((1, 4, 8, 8)), jnp.float32)
    y2 = jnp.asarray(rng.standard_normal((2, 1, 8, 32)), jnp.float32)
    m1 = jnp.ones((2, 8), jnp.int32)

    def model_apply(xx, tt, yy, mm, qctx):
        # zoo-convention positional binding — no y_pooled adapter needed
        return model.apply(variables, xx, tt, yy, mm, qctx=qctx)

    from viditq_tpu.samplers.iddpm import default_qctx_factory
    samples, traj = jax.jit(
        lambda z: rectified_flow_sample(
            model_apply, z, y2, m1, num_steps=4,
            qctx_factory=default_qctx_factory("quant"),
            return_trajectory=True))(z)
    assert samples.shape == z.shape
    assert traj["xs"].shape[0] == 4
    assert np.isfinite(np.asarray(samples)).all()


def test_joint_attention_pad_mask_equivalence():
    """The block pads joint [txt; img] attention to a 256-multiple with a
    kv padding mask so the flash kernel can engage on TPU (joint N = 77 +
    4096 = 4173 at 1024px is not a 128-multiple). The pad+mask+slice
    algebra must be exact vs the unpadded attention."""
    from viditq_tpu.models.layers import sdpa, sdpa_xla

    rng = np.random.default_rng(1)
    B, H, N, D = 2, 4, 141, 16
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
               for _ in range(3))
    ref = sdpa_xla(q, k, v, scale=D ** -0.5)

    pad = (-N) % 256
    zpad = ((0, 0), (0, 0), (0, pad), (0, 0))
    qp, kp, vp = (jnp.pad(a, zpad) for a in (q, k, v))
    kv_mask = jnp.broadcast_to((jnp.arange(N + pad) < N)[None],
                               (B, N + pad)).astype(jnp.int32)
    out = sdpa(qp, kp, vp, scale=D ** -0.5, kv_mask=kv_mask)[:, :, :N]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mmdit_forward_with_padded_joint_attention():
    """Model-level: a shape where joint N (77 + 64 = 141) triggers the
    internal pad path; fp and quant forwards stay finite and close."""
    model = MMDiT(input_size=16, patch_size=2, in_channels=4, hidden_size=64,
                  depth=2, num_heads=4, caption_channels=32,
                  pooled_channels=16, model_max_length=77, dtype=jnp.float32,
                  resolver=resolver)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 16, 16)), jnp.float32)
    t = jnp.asarray([500.0])
    y = jnp.asarray(rng.standard_normal((1, 1, 77, 32)), jnp.float32)
    mask = jnp.ones((1, 77), jnp.int32)
    variables = dict(model.init(jax.random.PRNGKey(0), x, t, y, mask, None,
                                QuantCtx(mode="fp")))
    out = model.apply(variables, x, t, y, mask, None, QuantCtx(mode="fp"))
    assert out.shape == (1, 4, 16, 16)
    assert np.isfinite(np.asarray(out)).all()

    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolver)
    out_q = model.apply(variables, x, t, y, mask, None,
                        QuantCtx(mode="quant", t_id=jnp.asarray(500)))
    assert np.isfinite(np.asarray(out_q)).all()
    rel = (np.linalg.norm(np.asarray(out_q - out))
           / np.linalg.norm(np.asarray(out)))
    assert 0 < rel < 0.6, rel
