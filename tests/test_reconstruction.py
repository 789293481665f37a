"""AdaRound reconstruction tests: optimized rounding beats nearest at 3-4
bits on layer-output MSE."""

import numpy as np
import jax
import jax.numpy as jnp

from viditq_tpu.quant import core
from viditq_tpu.quant.reconstruction import (
    ReconConfig, capture_layer_io, layer_reconstruction, model_reconstruction)
from viditq_tpu.quant.spec import LayerQuantSpec, QuantSpec


def test_layer_reconstruction_beats_nearest():
    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.standard_normal((32, 48)) * 0.2, jnp.float32)
    x = jnp.asarray(rng.standard_normal((128, 32)), jnp.float32)
    y = x @ kernel
    wspec = QuantSpec(n_bits=3, granularity="channel", channel_axis=-1,
                      round_mode="learned_hard_sigmoid")
    lspec = LayerQuantSpec(weight=wspec, act=None, act_quant=False)
    res = layer_reconstruction(kernel, None, x, y, lspec,
                               ReconConfig(iters=300, batch_size=64,
                                           lambda_coeff=0.01))
    # hard-rounding result with optimized alpha
    d, z = res["w_delta"], res["w_zp"]
    hard = jnp.floor(kernel / d) + (res["w_alpha"] >= 0)
    w_opt = (jnp.clip(hard + z, 0, 2 ** 3 - 1) - z) * d
    # nearest-rounding baseline
    w_near = core.fake_quant(
        kernel, d, z, QuantSpec(n_bits=3, granularity="channel",
                                channel_axis=-1, round_mode="nearest"))
    mse_opt = float(jnp.mean((x @ w_opt - y) ** 2))
    mse_near = float(jnp.mean((x @ w_near - y) ** 2))
    assert mse_opt < mse_near, (mse_opt, mse_near)
    # losses decreased over training
    losses = np.asarray(res["recon_losses"])
    assert losses[-50:].mean() < losses[:50].mean()


def test_model_reconstruction_via_capture():
    from viditq_tpu.models import PixArt
    from viditq_tpu.quant import resolve_layer_spec, QuantCtx

    wspec = QuantSpec(n_bits=4, granularity="channel", channel_axis=-1,
                      round_mode="learned_hard_sigmoid")
    aspec = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
                      dynamic=True)
    base = LayerQuantSpec(weight=wspec, act=aspec)
    fp = ("x_embedder", "t_embedder", "y_embedder", "final_layer")
    resolver = lambda n: resolve_layer_spec(n, base, fp)
    model = PixArt(input_size=8, patch_size=2, in_channels=4, hidden_size=32,
                   depth=1, num_heads=4, caption_channels=16,
                   model_max_length=4, dtype=jnp.float32, resolver=resolver)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([10.0, 20.0])
    y = jnp.asarray(rng.standard_normal((2, 1, 4, 16)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, t, y, None,
                           qctx=QuantCtx(mode="fp"))
    variables = dict(variables)
    io = capture_layer_io(model, variables, (x, t, y, None))
    assert "blocks.0.attn.q" in io
    from viditq_tpu.quant import calibrate_weight_tables
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolver)
    out = model_reconstruction(variables, io, resolver,
                               ReconConfig(iters=50, batch_size=16,
                                           lambda_coeff=0.01))
    alpha = np.asarray(out["quant"]["blocks_0"]["attn"]["q"]["w_alpha"])
    assert np.abs(alpha).sum() > 0
    # quantized forward with hard AdaRound rounding runs
    res = model.apply(out, x, t, y, None,
                      qctx=QuantCtx(mode="quant", soft_targets=False))
    assert np.isfinite(np.asarray(res)).all()


def test_mlp_block_reconstruction_beats_layerwise_nearest():
    from viditq_tpu.quant.reconstruction import mlp_block_reconstruction
    rng = np.random.default_rng(0)
    fc1 = jnp.asarray(rng.standard_normal((24, 48)) * 0.2, jnp.float32)
    fc2 = jnp.asarray(rng.standard_normal((48, 24)) * 0.2, jnp.float32)
    x = jnp.asarray(rng.standard_normal((256, 24)), jnp.float32)
    h = jax.nn.gelu(x @ fc1, approximate=True)
    y = h @ fc2
    wspec = QuantSpec(n_bits=3, granularity="channel", channel_axis=-1,
                      round_mode="learned_hard_sigmoid")
    lspec = LayerQuantSpec(weight=wspec, act=None, act_quant=False)
    res = mlp_block_reconstruction(fc1, None, fc2, None, x, y, lspec,
                                   ReconConfig(iters=400, batch_size=64,
                                               lambda_coeff=0.01))

    def hard(name_res, k):
        d, z = name_res["w_delta"], name_res["w_zp"]
        code = jnp.floor(k / d) + (name_res["w_alpha"] >= 0)
        return (jnp.clip(code + z, 0, 7) - z) * d

    w1, w2 = hard(res["fc1"], fc1), hard(res["fc2"], fc2)
    y_opt = jax.nn.gelu(x @ w1, approximate=True) @ w2
    # nearest baseline
    near = []
    for k in (fc1, fc2):
        d, z = core.compute_qparams(k, wspec)
        near.append(core.fake_quant(
            k, d, z, QuantSpec(n_bits=3, granularity="channel",
                               channel_axis=-1, round_mode="nearest")))
    y_near = jax.nn.gelu(x @ near[0], approximate=True) @ near[1]
    mse_opt = float(jnp.mean((y_opt - y) ** 2))
    mse_near = float(jnp.mean((y_near - y) ** 2))
    assert mse_opt < mse_near, (mse_opt, mse_near)
