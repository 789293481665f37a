"""AOT export tests (utils/export.py): serialize -> deserialize -> call
equals the live forward, for fp and quantized models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viditq_tpu.models import STDiT
from viditq_tpu.quant import (LayerQuantSpec, QuantCtx, QuantSpec,
                              calibrate_weight_tables, resolve_layer_spec)
from viditq_tpu.utils.export import (export_fn, export_quant_forward,
                                     load_exported)

pytestmark = pytest.mark.heavy

KW = dict(input_size=(2, 8, 8), in_channels=4, patch_size=(1, 2, 2),
          hidden_size=32, depth=1, num_heads=4, caption_channels=16,
          model_max_length=4, dtype=jnp.float32)


def _inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 2, 8, 8)), jnp.float32)
    t = jnp.asarray([500.0, 100.0])
    y = jnp.asarray(rng.standard_normal((2, 1, 4, 16)), jnp.float32)
    mask = jnp.ones((2, 4), jnp.int32)
    return x, t, y, mask


def test_export_fp_forward_roundtrip():
    model = STDiT(**KW)
    x, t, y, mask = _inputs()
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    want = model.apply(variables, x, t, y, mask)
    blob = export_quant_forward(model, variables, x, t, y, mask)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0
    got = load_exported(blob)(x, t, y, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_export_quantized_forward_unbaked():
    """variables passed at call time: one artifact, many checkpoints."""
    w8 = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1)
    a8 = QuantSpec(n_bits=8, granularity="token", dynamic=True)
    fp = ("x_embedder", "t_block", "t_embedder", "y_embedder", "final_layer")
    resolver = lambda n: resolve_layer_spec(  # noqa: E731
        n, LayerQuantSpec(weight=w8, act=a8), fp)
    model = STDiT(resolver=resolver, **KW)
    x, t, y, mask = _inputs()
    variables = dict(model.init(jax.random.PRNGKey(0), x, t, y, mask,
                                QuantCtx(mode="fp")))
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolver)
    qctx = QuantCtx(mode="quant", t_id=jnp.asarray(500))
    want = model.apply(variables, x, t, y, mask, qctx)
    blob = export_quant_forward(model, variables, x, t, y, mask,
                                qctx=qctx, baked_variables=False)
    fn = load_exported(blob)
    got = fn(variables, x, t, y, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # a second checkpoint through the SAME artifact
    variables2 = jax.tree.map(lambda v: v * 1.01
                              if jnp.issubdtype(v.dtype, jnp.floating)
                              else v, variables)
    want2 = model.apply(variables2, x, t, y, mask, qctx)
    got2 = fn(variables2, x, t, y, mask)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-6, atol=1e-6)


def test_export_shape_mismatch_rejected():
    model = STDiT(**KW)
    x, t, y, mask = _inputs()
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    blob = export_quant_forward(model, variables, x, t, y, mask)
    fn = load_exported(blob)
    with pytest.raises(Exception):
        fn(x[:1], t[:1], y[:1], mask[:1])


def test_export_full_sampling_scan():
    """The whole ddim sampling scan (per-step quant switching inside)
    exports and serves as one artifact."""
    from viditq_tpu.samplers import IDDPM
    from viditq_tpu.samplers.iddpm import default_qctx_factory
    w8 = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1)
    a8 = QuantSpec(n_bits=8, granularity="token", dynamic=True)
    fp = ("x_embedder", "t_block", "t_embedder", "y_embedder", "final_layer")
    resolver = lambda n: resolve_layer_spec(  # noqa: E731
        n, LayerQuantSpec(weight=w8, act=a8), fp)
    model = STDiT(resolver=resolver, **KW)
    x, t, y, mask = _inputs()
    variables = dict(model.init(jax.random.PRNGKey(0), x, t, y, mask,
                                QuantCtx(mode="fp")))
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolver)
    sampler = IDDPM(num_sampling_steps=2, cfg_scale=4.0)
    y2 = jnp.concatenate([y, y * 0], axis=0)

    def denoise(z):
        return sampler.sample(
            lambda xx, tt, yy, mm, qctx: model.apply(variables, xx, tt,
                                                     yy, mm, qctx),
            z, y2, mask, sampler_type="ddim",
            qctx_factory=default_qctx_factory("quant"))

    z = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 4, 2, 8, 8)), jnp.float32)
    want = denoise(z)
    blob = export_fn(denoise, z)
    got = load_exported(blob)(z)
    # the artifact is recompiled StableHLO: float reassociation + quant
    # LSB flips give ~2e-4 max abs over 2 steps (measured)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
