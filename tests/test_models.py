"""Model-level tests: tiny STDiT / PixArt forwards (FP and quantized)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from viditq_tpu.models import STDiT, PixArt
from viditq_tpu.quant import (
    LayerQuantSpec, QuantSpec, SmoothQuantSpec, QuantCtx,
    calibrate_weight_tables, resolve_layer_spec)

W8 = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
               round_mode="nearest")
A8_DYN = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
                   dynamic=True)
DEFAULT = LayerQuantSpec(weight=W8, act=A8_DYN)
FP_LIST = ("x_embedder", "t_block", "t_embedder", "y_embedder", "final_layer")


def resolver(name):
    return resolve_layer_spec(name, DEFAULT, FP_LIST)


def tiny_stdit(**kw):
    return STDiT(input_size=(4, 8, 8), in_channels=4, patch_size=(1, 2, 2),
                 hidden_size=64, depth=2, num_heads=4, caption_channels=32,
                 model_max_length=8, dtype=jnp.float32, **kw)


def tiny_pixart(**kw):
    return PixArt(input_size=8, patch_size=2, in_channels=4, hidden_size=64,
                  depth=2, num_heads=4, caption_channels=32,
                  model_max_length=8, dtype=jnp.float32, **kw)


def stdit_inputs(B=2):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 4, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([500.0] * B)
    y = jnp.asarray(rng.standard_normal((B, 1, 8, 32)), jnp.float32)
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0, 0, 0]] * B))
    return x, t, y, mask


@pytest.mark.heavy
def test_stdit_fp_forward_shapes():
    model = tiny_stdit()
    x, t, y, mask = stdit_inputs()
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    out = model.apply(variables, x, t, y, mask)
    assert out.shape == (2, 8, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_stdit_mask_only_affects_masked_tokens():
    model = tiny_stdit()
    x, t, y, mask = stdit_inputs()
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    out1 = model.apply(variables, x, t, y, mask)
    # perturb a masked-out prompt token: output must not change
    y2 = y.at[:, :, 5, :].set(99.0)
    out2 = model.apply(variables, x, t, y2, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5)
    # perturb a kept token: output must change
    y3 = y.at[:, :, 0, :].set(99.0)
    out3 = model.apply(variables, x, t, y3, mask)
    assert np.abs(np.asarray(out3) - np.asarray(out1)).max() > 1e-3


def test_stdit_quantized_close_to_fp():
    model = tiny_stdit(resolver=resolver)
    x, t, y, mask = stdit_inputs()
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask,
                           QuantCtx(mode="fp"))
    variables = dict(variables)
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolver)
    out_fp = model.apply(variables, x, t, y, mask, QuantCtx(mode="fp"))
    out_q = model.apply(variables, x, t, y, mask,
                        QuantCtx(mode="quant", t_id=jnp.asarray(500)))
    rel = (np.linalg.norm(np.asarray(out_q - out_fp))
           / np.linalg.norm(np.asarray(out_fp)))
    assert 0 < rel < 0.12, rel


def test_stdit_fp_layer_list_layers_have_no_quant_vars():
    model = tiny_stdit(resolver=resolver)
    x, t, y, mask = stdit_inputs()
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask,
                           QuantCtx(mode="fp"))
    quant = variables["quant"]
    assert "final_layer" not in quant
    assert "blocks_0" in quant
    assert "w_delta" in quant["blocks_0"]["attn"]["q"]


def test_pixart_fp_and_quant_forward():
    model = tiny_pixart(resolver=resolver)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([100.0, 100.0])
    y = jnp.asarray(rng.standard_normal((2, 1, 8, 32)), jnp.float32)
    mask = jnp.ones((2, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask,
                           qctx=QuantCtx(mode="fp"))
    out = model.apply(variables, x, t, y, mask, qctx=QuantCtx(mode="fp"))
    assert out.shape == (2, 8, 8, 8)
    variables = dict(variables)
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolver)
    out_q = model.apply(variables, x, t, y, mask,
                        qctx=QuantCtx(mode="quant"))
    rel = (np.linalg.norm(np.asarray(out_q - out))
           / np.linalg.norm(np.asarray(out)))
    assert 0 < rel < 0.12, rel


def test_pixart_kv_compress_forward():
    model = tiny_pixart(kv_compress_sampling="conv", kv_compress_scale=2,
                        kv_compress_layers=(1,))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([10.0])
    y = jnp.asarray(rng.standard_normal((1, 1, 8, 32)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, t, y, None)
    out = model.apply(variables, x, t, y, None)
    assert out.shape == (1, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_pixart_sigma_sr_conv_is_quantizable():
    """A plan naming blocks.N.attn.sr must actually quantize the Σ
    KV-compress depthwise conv (the reference wraps every nn.Conv2d,
    quant_model.py:73) — with a coarse 2-bit spec the quantized forward
    must diverge from fp; disabling sr restores near-identity."""
    import dataclasses
    from viditq_tpu.quant import resolve_layer_spec
    W2 = QuantSpec(n_bits=2, granularity="channel", channel_axis=-1,
                   round_mode="nearest")
    base = LayerQuantSpec(weight=W2, act=A8_DYN)

    def res_sr_only(name):
        if name.endswith(".sr"):
            return base
        return base.disabled()

    model = tiny_pixart(kv_compress_sampling="conv", kv_compress_scale=2,
                        kv_compress_layers=(1,), resolver=res_sr_only)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([10.0])
    y = jnp.asarray(rng.standard_normal((1, 1, 8, 32)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, t, y, None,
                           qctx=QuantCtx(mode="fp"))
    out_fp = model.apply(variables, x, t, y, None, qctx=QuantCtx(mode="fp"))
    out_q = model.apply(variables, x, t, y, None,
                        qctx=QuantCtx(mode="quant"))
    rel = (np.linalg.norm(np.asarray(out_q - out_fp))
           / np.linalg.norm(np.asarray(out_fp)))
    assert rel > 1e-4, rel  # the sr quantizer is actually applied


def test_stdit_smooth_quant_end_to_end():
    sq = SmoothQuantSpec(enable=True, alpha=(0.11, 0.11),
                         timerange=((0, 500), (501, 1000)))
    default = LayerQuantSpec(weight=QuantSpec(n_bits=4, granularity="channel",
                                              channel_axis=-1,
                                              round_mode="nearest"),
                             act=A8_DYN, smooth_quant=sq)
    res = functools.partial(resolve_layer_spec, default=default,
                            fp_patterns=FP_LIST)
    model = tiny_stdit(resolver=res)
    x, t, y, mask = stdit_inputs()
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask,
                           QuantCtx(mode="fp"))
    variables = dict(variables)
    # stat pass over both timeranges
    for tid in (100, 400, 700, 900):
        _, upd = model.apply(
            variables, x, t, y, mask,
            QuantCtx(mode="sq_stat", t_id=jnp.asarray(tid)),
            mutable=["quant", "qstats"])
        variables["quant"] = upd["quant"]
        variables["qstats"] = upd["qstats"]
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], res)
    out_fp = model.apply(variables, x, t, y, mask, QuantCtx(mode="fp"))
    out_q = model.apply(variables, x, t, y, mask,
                        QuantCtx(mode="quant", t_id=jnp.asarray(300)))
    rel = (np.linalg.norm(np.asarray(out_q - out_fp))
           / np.linalg.norm(np.asarray(out_fp)))
    assert np.isfinite(np.asarray(out_q)).all()
    assert rel < 0.5, rel  # W4 on random weights is coarse; just sanity
