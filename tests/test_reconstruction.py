"""AdaRound reconstruction tests: optimized rounding beats nearest at 3-4
bits on layer-output MSE."""

import numpy as np
import jax
import jax.numpy as jnp

from viditq_tpu.quant import core
from viditq_tpu.quant.reconstruction import (
    ReconConfig, capture_layer_io, layer_reconstruction, model_reconstruction)
from viditq_tpu.quant.spec import LayerQuantSpec, QuantSpec
import pytest

pytestmark = pytest.mark.heavy


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


def _tiny_stdit_setup(w_bits=4, seed=0):
    from viditq_tpu.models import STDiT
    from viditq_tpu.quant import (QuantCtx, calibrate_weight_tables,
                                  resolve_layer_spec)

    wspec = QuantSpec(n_bits=w_bits, granularity="channel", channel_axis=-1,
                      round_mode="learned_hard_sigmoid")
    aspec = QuantSpec(n_bits=8, granularity="token",
                      round_mode="nearest_ste", dynamic=True)
    base = LayerQuantSpec(weight=wspec, act=aspec)
    fp = ("x_embedder", "t_embedder", "t_block", "y_embedder", "final_layer")
    resolver = lambda n: resolve_layer_spec(n, base, fp)  # noqa: E731
    model = STDiT(input_size=(2, 8, 8), in_channels=4, patch_size=(1, 2, 2),
                  hidden_size=32, depth=2, num_heads=4, caption_channels=16,
                  model_max_length=4, dtype=jnp.float32, resolver=resolver)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((4, 4, 2, 8, 8)), jnp.float32)
    t = jnp.asarray([10.0, 20.0, 500.0, 900.0])
    y = jnp.asarray(rng.standard_normal((4, 1, 4, 16)), jnp.float32)
    mask = jnp.ones((4, 4), jnp.int32)
    args = (x, t, y, mask)
    variables = dict(model.init(jax.random.PRNGKey(0), *args,
                                qctx=QuantCtx(mode="fp")))
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolver)
    return model, variables, args, resolver


def test_block_reconstruction_beats_layer_recon():
    """VERDICT round-1 #5: joint block-output AdaRound (all quant layers of
    a STDiT block: spatial/temporal attn + cross attn + MLP) must beat
    layer-wise recon on the model-output MSE at W4."""
    from viditq_tpu.quant import QuantCtx
    from viditq_tpu.quant.reconstruction import (
        capture_block_io, model_block_reconstruction)

    model, variables, args, resolver = _tiny_stdit_setup()
    fp_out = model.apply(variables, *args, qctx=QuantCtx(mode="fp"))

    def quant_mse(vs):
        q = model.apply(vs, *args,
                        qctx=QuantCtx(mode="quant", soft_targets=False))
        return float(jnp.mean((q - fp_out) ** 2))

    nearest_mse = quant_mse(variables)

    # block-IO capture sanity
    io = capture_block_io(model, variables, args)
    assert sorted(io["blocks"]) == [0, 1]
    x_in0, y_out0 = io["blocks"][0]
    assert x_in0.shape == y_out0.shape
    np.testing.assert_allclose(np.asarray(io["blocks"][1][0]),
                               np.asarray(y_out0), rtol=1e-5)

    # layer-wise recon
    layer_io = capture_layer_io(model, variables, args)
    cfg = ReconConfig(iters=150, batch_size=32, lambda_coeff=0.001)
    v_layer = model_reconstruction(
        {k: dict(v) if isinstance(v, dict) else v
         for k, v in variables.items()}, layer_io, resolver, cfg)
    layer_mse = quant_mse(v_layer)

    # block recon
    v_block = model_block_reconstruction(model, dict(variables), args, cfg,
                                         mask=args[3])
    block_mse = quant_mse(v_block)

    assert layer_mse < nearest_mse * 1.001
    assert block_mse < layer_mse, (
        f"block recon ({block_mse}) should beat layer recon ({layer_mse})")


def test_optimization_config_parse(tmp_path):
    """The reference's recon knobs load from the YAML optimization section
    (presence of params => enabled, t2i/scripts/ptq.py:320-331)."""
    from viditq_tpu.utils.config import load_quant_config
    yaml_text = """
part_fp_list: ""
model: {model_id: pixart, model_type: pixart}
conditional: True
calib_data: {n_steps: 4, batch_size: 2, n_samples: 2}
quant:
    weight:
        optimization:
            iters: 123
            granularity: block
            loss: {lambda_coeff: 0.5, warmup: 0.1}
            params:
                alpha: {lr: 1.e-2}
        quantizer:
            n_bits: 4
            per_group: "channel"
            scale_method: "min_max"
            round_mode: "learned_hard_sigmoid"
    activation:
        optimization:
        quantizer:
            n_bits: 8
            per_group: "token"
            round_mode: "nearest_ste"
            dynamic: True
            smooth_quant: {enable: False}
"""
    p = tmp_path / "recon.yaml"
    p.write_text(yaml_text)
    plan = load_quant_config(str(p))
    assert plan.weight_opt is not None and plan.weight_opt.enabled
    assert plan.weight_opt.iters == 123
    assert plan.weight_opt.granularity == "block"
    assert plan.weight_opt.alpha_lr == 1e-2
    assert plan.weight_opt.lambda_coeff == 0.5
    assert plan.act_opt is None or not plan.act_opt.enabled
    assert plan.default_layer.weight.round_mode == "learned_hard_sigmoid"
