"""DiT / Latte model tests (class- and text-conditional, quantized)."""

import numpy as np
import jax
import jax.numpy as jnp

from viditq_tpu.models import DiT, Latte
from viditq_tpu.quant import (
    LayerQuantSpec, QuantSpec, QuantCtx, calibrate_weight_tables,
    resolve_layer_spec)

W8 = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
               round_mode="nearest")
A8 = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
               dynamic=True)
DEFAULT = LayerQuantSpec(weight=W8, act=A8)
FP = ("x_embedder", "t_embedder", "y_embedder", "final_layer")


def resolver(name):
    return resolve_layer_spec(name, DEFAULT, FP)


def test_dit_label_conditional_forward():
    model = DiT(input_size=(4, 8, 8), hidden_size=64, depth=2, num_heads=4,
                condition="label_10", dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 8, 8)),
                    jnp.float32)
    t = jnp.asarray([3.0, 7.0])
    y = jnp.asarray([1, 5])
    variables = model.init(jax.random.PRNGKey(0), x, t, y)
    out = model.apply(variables, x, t, y)
    assert out.shape == (2, 8, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_dit_text_conditional_quantized():
    model = DiT(input_size=(4, 8, 8), hidden_size=64, depth=2, num_heads=4,
                condition="text", caption_channels=32, dtype=jnp.float32,
                resolver=resolver)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([3.0, 7.0])
    y = jnp.asarray(rng.standard_normal((2, 1, 1, 32)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, t, y,
                           qctx=QuantCtx(mode="fp"))
    variables = dict(variables)
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolver)
    out_fp = model.apply(variables, x, t, y, qctx=QuantCtx(mode="fp"))
    out_q = model.apply(variables, x, t, y, qctx=QuantCtx(mode="quant"))
    rel = (np.linalg.norm(np.asarray(out_q - out_fp))
           / np.linalg.norm(np.asarray(out_fp)))
    assert 0 < rel < 0.15, rel


def test_latte_alternating_blocks_quantized():
    model = Latte(input_size=(4, 8, 8), hidden_size=64, depth=4, num_heads=4,
                  condition="label_10", dtype=jnp.float32, resolver=resolver)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([3.0, 7.0])
    y = jnp.asarray([0, 9])
    variables = model.init(jax.random.PRNGKey(0), x, t, y,
                           qctx=QuantCtx(mode="fp"))
    variables = dict(variables)
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolver)
    out = model.apply(variables, x, t, y, qctx=QuantCtx(mode="quant"))
    assert out.shape == (2, 8, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
    # 4 quantized blocks present with token-layout alternation
    q = variables["quant"]
    for i in range(4):
        assert "w_delta" in q[f"blocks_{i}"]["attn"]["q"]
