"""DiT / Latte model tests (class- and text-conditional, quantized)."""

import numpy as np
import jax
import jax.numpy as jnp

from viditq_tpu.models import DiT, Latte
import pytest

from viditq_tpu.quant import (
    LayerQuantSpec, QuantSpec, QuantCtx, calibrate_weight_tables,
    resolve_layer_spec)

pytestmark = pytest.mark.heavy

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


def test_latte_w4a8_timestep_aware_mp_sampling():
    """Latte W4A8 with timestep-aware mixed-precision bit allocation —
    the BASELINE.json 'Latte t2v W4A8 timestep-aware MP' config, driven
    through the same mp_quant_sample path as STDiT."""
    from viditq_tpu.pipelines.mixed_precision import mp_quant_sample
    from viditq_tpu.samplers import IDDPM
    from viditq_tpu.utils.config import QuantPlanConfig

    W4 = QuantSpec(n_bits=4, granularity="channel", channel_axis=-1,
                   round_mode="nearest", mixed_precision=(4, 8))
    base = LayerQuantSpec(weight=W4, act=A8)
    plan = QuantPlanConfig(default_layer=base, fp_patterns=FP,
                           mixed_precision=(4, 8))

    def model_ctor(res):
        return Latte(input_size=(4, 8, 8), hidden_size=64, depth=2,
                     num_heads=4, condition="text", caption_channels=32,
                     dtype=jnp.float32, resolver=res)

    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((1, 4, 4, 8, 8)), jnp.float32)
    y_c = jnp.asarray(rng.standard_normal((1, 1, 8, 32)), jnp.float32)
    y = jnp.concatenate([y_c, y_c * 0], axis=0)
    mask = jnp.ones((1, 8), jnp.int32)

    model = model_ctor(plan.resolver())
    variables = dict(model.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)),
                                y[:1], mask, qctx=QuantCtx(mode="fp")))
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], plan.resolver())

    sampler = IDDPM(num_sampling_steps=4, cfg_scale=4.0)
    mp_weight = {"3-2": {"blocks_0.attn.q": 4, "blocks_1.mlp.fc1": 4},
                 "1-0": {"blocks_0.attn.q": 8},
                 "fp_layers": ["blocks_1.cross_attn.kv_linear"]}
    out = mp_quant_sample(model_ctor, variables, sampler, z, y, mask, plan,
                          mp_weight, None)
    assert out.shape == z.shape
    assert np.isfinite(np.asarray(out)).all()
