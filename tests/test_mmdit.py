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
