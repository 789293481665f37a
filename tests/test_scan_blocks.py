"""scan_blocks (stacked block stack) equivalence tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from viditq_tpu.models import STDiT
from viditq_tpu.quant import (
    LayerQuantSpec, QuantSpec, QuantCtx, calibrate_weight_tables,
    resolve_layer_spec)
from viditq_tpu.utils.ckpt import stack_block_params, unstack_block_params
import pytest

pytestmark = pytest.mark.heavy

W8 = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
               round_mode="nearest")
A8 = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
               dynamic=True)
FP = ("x_embedder", "t_block", "t_embedder", "y_embedder", "final_layer")
DEFAULT = LayerQuantSpec(weight=W8, act=A8)


def resolver(name):
    return resolve_layer_spec(name, DEFAULT, FP)


def models(res=None):
    kw = dict(input_size=(4, 8, 8), in_channels=4, patch_size=(1, 2, 2),
              hidden_size=64, depth=3, num_heads=4, caption_channels=32,
              model_max_length=8, dtype=jnp.float32)
    if res:
        kw["resolver"] = res
    return (STDiT(scan_blocks=False, **kw), STDiT(scan_blocks=True, **kw))


def inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([500.0, 100.0])
    y = jnp.asarray(rng.standard_normal((2, 1, 8, 32)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0, 0]] * 2)
    return x, t, y, mask


def test_scan_fp_matches_unrolled():
    un, sc = models()
    x, t, y, mask = inputs()
    v_un = un.init(jax.random.PRNGKey(0), x, t, y, mask)
    v_sc = {"params": stack_block_params(
        jax.tree.map(np.asarray, v_un["params"]), 3)}
    out_un = un.apply(v_un, x, t, y, mask)
    out_sc = sc.apply(v_sc, x, t, y, mask)
    np.testing.assert_allclose(np.asarray(out_sc), np.asarray(out_un),
                               rtol=2e-4, atol=2e-4)
    # roundtrip the stacking
    back = unstack_block_params(v_sc["params"])
    np.testing.assert_array_equal(
        np.asarray(back["blocks_1"]["attn"]["q"]["kernel"]),
        np.asarray(v_un["params"]["blocks_1"]["attn"]["q"]["kernel"]))


def test_scan_quantized_matches_unrolled():
    un, sc = models(resolver)
    x, t, y, mask = inputs()
    v_un = dict(un.init(jax.random.PRNGKey(0), x, t, y, mask,
                        QuantCtx(mode="fp")))
    v_un["quant"] = calibrate_weight_tables(v_un["params"], v_un["quant"],
                                            resolver)
    v_sc = {"params": stack_block_params(
        jax.tree.map(np.asarray, v_un["params"]), 3)}
    v_sc_init = dict(sc.init(jax.random.PRNGKey(0), x, t, y, mask,
                             QuantCtx(mode="fp")))
    v_sc["quant"] = calibrate_weight_tables(v_sc["params"],
                                            v_sc_init["quant"], resolver)
    qctx = QuantCtx(mode="quant", t_id=jnp.asarray(500))
    out_un = un.apply(v_un, x, t, y, mask, qctx)
    out_sc = sc.apply(v_sc, x, t, y, mask, qctx)
    # fake-quant rounding-boundary flips under different op orderings make
    # elementwise equality too strict; require norm-level agreement
    rel = (np.linalg.norm(np.asarray(out_sc - out_un))
           / np.linalg.norm(np.asarray(out_un)))
    assert rel < 5e-3, rel


def _stack_all(variables, depth):
    return {coll: stack_block_params(jax.tree.map(np.asarray, tree), depth)
            for coll, tree in variables.items()}


def test_scan_index_named_override_native_pack():
    """Index-named per-block override patterns ('blocks.[0-2].attn.q') must
    calibrate/pack the same tables under scan_blocks as unrolled.

    Regression for the round-4 W4A8 quality bug: scanned packing resolved
    the raw stacked path name ('blocks.attn.q'), fell through every
    index-bearing override pattern and packed the DEFAULT spec's codes,
    while the runtime (resolving 'blocks.0.attn.q', stdit.py scan prefix)
    dequantized them with the OVERRIDE's tables."""
    from viditq_tpu.quant.native_pack import pack_native_weights

    w8n = dataclasses.replace(W8, mixed_precision=(4, 8))
    w4n = dataclasses.replace(w8n, n_bits=4)
    default = LayerQuantSpec(weight=w8n, act=A8, backend="native")
    ov = {"blocks.[0-2].attn.q": dataclasses.replace(default, weight=w4n)}

    def res(name):
        return resolve_layer_spec(name, default, FP, ov)

    un, sc = models(res)
    x, t, y, mask = inputs()
    qctx0 = QuantCtx(mode="fp")
    v_un = dict(un.init(jax.random.PRNGKey(0), x, t, y, mask, qctx0))
    v_un["quant"] = calibrate_weight_tables(v_un["params"], v_un["quant"],
                                            res)
    v_un["quant"] = pack_native_weights(v_un["params"], v_un["quant"], res)

    v_sc = _stack_all({k: v_un[k] for k in ("params", "quant")}, 3)
    # scanned slot shapes must match the model's own declaration
    sc_init = jax.eval_shape(
        lambda: sc.init(jax.random.PRNGKey(0), x, t, y, mask, qctx0))
    assert (v_sc["quant"]["blocks"]["attn"]["q"]["w_int"].shape
            == sc_init["quant"]["blocks"]["attn"]["q"]["w_int"].shape)
    # calibrate+pack THROUGH the scanned paths and compare tables with the
    # stacked unrolled ones — codes must be identical (W4, not default W8)
    q2 = calibrate_weight_tables(v_sc["params"], v_sc["quant"], res)
    q2 = pack_native_weights(v_sc["params"], q2, res)
    np.testing.assert_array_equal(
        np.asarray(q2["blocks"]["attn"]["q"]["w_int"]),
        np.asarray(v_sc["quant"]["blocks"]["attn"]["q"]["w_int"]))
    np.testing.assert_allclose(
        np.asarray(q2["blocks"]["attn"]["q"]["w_delta"]),
        np.asarray(v_sc["quant"]["blocks"]["attn"]["q"]["w_delta"]))
    v_sc["quant"] = q2

    qctx = QuantCtx(mode="quant", t_id=jnp.asarray(500))
    out_un = un.apply(v_un, x, t, y, mask, qctx)
    out_sc = sc.apply(v_sc, x, t, y, mask, qctx)
    rel = (np.linalg.norm(np.asarray(out_sc - out_un))
           / np.linalg.norm(np.asarray(out_un)))
    assert rel < 5e-3, rel


def test_scan_per_block_mp_gather_matches_unrolled():
    """Per-block DIFFERING bit allocations through the gather-MP sampler:
    the scanned model packs each block's slab at its own bits (per-block
    w_mp tables) and matches the unrolled model end-to-end."""
    from viditq_tpu.pipelines.mixed_precision import build_mp_sampler
    from viditq_tpu.quant.native_pack import pack_native_weights
    from viditq_tpu.quant.spec import SmoothQuantSpec
    from viditq_tpu.samplers import IDDPM

    sq = SmoothQuantSpec(enable=True,
                         channel_wise_scale_type="momentum_act_max",
                         alpha=(0.3, 0.5),
                         timerange=((0, 500), (501, 1000)))
    w4n = dataclasses.replace(W8, n_bits=4, mixed_precision=(4, 8))
    base = LayerQuantSpec(weight=w4n, act=A8, smooth_quant=sq,
                          backend="native")
    from viditq_tpu.utils.config import QuantPlanConfig
    plan = QuantPlanConfig(default_layer=base, fp_patterns=FP,
                           mixed_precision=(4, 8))
    res = plan.resolver()

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 4, 4, 8, 8)), jnp.float32)
    y_c = jnp.asarray(rng.standard_normal((1, 1, 8, 32)), jnp.float32)
    y = jnp.concatenate([y_c, y_c * 0], axis=0)
    mask = jnp.ones((1, 8), jnp.int32)
    kw = dict(input_size=(4, 8, 8), in_channels=4, patch_size=(1, 2, 2),
              hidden_size=64, depth=3, num_heads=4, caption_channels=32,
              model_max_length=8, dtype=jnp.float32)

    def ctor_un(r):
        return STDiT(scan_blocks=False, resolver=r or (lambda n: None), **kw)

    def ctor_sc(r):
        return STDiT(scan_blocks=True, resolver=r or (lambda n: None), **kw)

    un = ctor_un(res)
    v_un = dict(un.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)), y[:1],
                        mask, QuantCtx(mode="fp")))
    for t_id in (100, 900):
        _, muts = un.apply(
            v_un, z, jnp.full((1,), float(t_id)), y[:1], mask,
            QuantCtx(mode="sq_stat", t_id=jnp.asarray(t_id, jnp.int32)),
            mutable=["quant", "qstats"])
        v_un["quant"] = muts["quant"]
        v_un["qstats"] = muts["qstats"]
    v_un["quant"] = calibrate_weight_tables(v_un["params"], v_un["quant"],
                                            res)
    v_un["quant"] = pack_native_weights(v_un["params"], v_un["quant"], res)
    v_sc = _stack_all(v_un, 3)

    # block 0 W8 in the outer range, blocks 1-2 stay W4 — bits VARY by block
    mp_weight = {"3-2": {"model.blocks.0.attn.q": 8,
                         "model.blocks.0.mlp.fc1": 8},
                 "1-0": {"model.blocks.0.attn.q": 4}}
    sampler = IDDPM(num_sampling_steps=4, cfg_scale=4.0)

    fn_un = build_mp_sampler(ctor_un, sampler, plan, mp_weight, None)
    fn_sc = build_mp_sampler(ctor_sc, sampler, plan, mp_weight, None)
    assert hasattr(fn_sc, "n_ranges"), "native CB plan must take gather path"
    out_un = fn_un(v_un, z, y, mask)
    out_sc = fn_sc(v_sc, z, y, mask)
    assert np.isfinite(np.asarray(out_sc)).all()
    rel = (np.linalg.norm(np.asarray(out_sc - out_un))
           / max(np.linalg.norm(np.asarray(out_un)), 1e-9))
    assert rel < 1e-2, rel


def test_pixart_scan_matches_unrolled():
    from viditq_tpu.models import PixArt
    kw = dict(input_size=8, patch_size=2, in_channels=4, hidden_size=64,
              depth=3, num_heads=4, caption_channels=32, model_max_length=8,
              dtype=jnp.float32)
    un = PixArt(scan_blocks=False, **kw)
    sc = PixArt(scan_blocks=True, **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([500.0, 100.0])
    y = jnp.asarray(rng.standard_normal((2, 1, 8, 32)), jnp.float32)
    mask = jnp.ones((2, 8), jnp.int32)
    v_un = un.init(jax.random.PRNGKey(0), x, t, y, mask)
    v_sc = {"params": stack_block_params(
        jax.tree.map(np.asarray, v_un["params"]), 3)}
    out_un = un.apply(v_un, x, t, y, mask)
    out_sc = sc.apply(v_sc, x, t, y, mask)
    np.testing.assert_allclose(np.asarray(out_sc), np.asarray(out_un),
                               rtol=2e-4, atol=2e-4)


def test_pixart_sigma_kv_compress_scan_matches_unrolled():
    """Σ KV compression under scan_blocks: the stack scans in contiguous
    uniform runs (uncompressed prefix + compressed tail, reference config
    kv_compress_layer=[14..27]) and matches the unrolled model."""
    from viditq_tpu.models import PixArt
    from viditq_tpu.utils.ckpt import stack_block_params_runs
    kw = dict(input_size=8, patch_size=2, in_channels=4, hidden_size=64,
              depth=4, num_heads=4, caption_channels=32, model_max_length=8,
              kv_compress_sampling="uniform", kv_compress_scale=2,
              kv_compress_layers=(2, 3), dtype=jnp.float32)
    un = PixArt(scan_blocks=False, **kw)
    sc = PixArt(scan_blocks=True, **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([500.0, 100.0])
    y = jnp.asarray(rng.standard_normal((2, 1, 8, 32)), jnp.float32)
    mask = jnp.ones((2, 8), jnp.int32)
    v_un = un.init(jax.random.PRNGKey(0), x, t, y, mask)
    v_sc = {"params": stack_block_params_runs(
        jax.tree.map(np.asarray, v_un["params"]), [(0, 2), (2, 2)])}
    out_un = un.apply(v_un, x, t, y, mask)
    out_sc = sc.apply(v_sc, x, t, y, mask)
    np.testing.assert_allclose(np.asarray(out_sc), np.asarray(out_un),
                               rtol=2e-4, atol=2e-4)
    # conv-sampling variant initializes and runs under scan
    kw2 = dict(kw, kv_compress_sampling="conv")
    sc2 = PixArt(scan_blocks=True, **kw2)
    v2 = sc2.init(jax.random.PRNGKey(0), x, t, y, mask)
    out2 = sc2.apply(v2, x, t, y, mask)
    assert np.isfinite(np.asarray(out2)).all()


def test_mp_static_segments_match_gather():
    """The static-segment union-MP runner (one denoise_range per union
    span, tr_id pinned as a compile-time constant) computes the SAME
    sampling trajectory as the single-scan gather runner — identical
    packed variables, identical per-step bits, only static vs dynamic
    timerange indexing."""
    from viditq_tpu.pipelines.mixed_precision import build_mp_sampler_gather
    from viditq_tpu.quant.native_pack import pack_native_weights
    from viditq_tpu.quant.spec import SmoothQuantSpec
    from viditq_tpu.samplers import IDDPM
    from viditq_tpu.utils.config import QuantPlanConfig

    sq = SmoothQuantSpec(enable=True,
                         channel_wise_scale_type="momentum_act_max",
                         alpha=(0.3, 0.5),
                         timerange=((0, 500), (501, 1000)))
    w4n = dataclasses.replace(W8, n_bits=4, mixed_precision=(4, 8))
    base = LayerQuantSpec(weight=w4n, act=A8, smooth_quant=sq,
                          backend="native")
    plan = QuantPlanConfig(default_layer=base, fp_patterns=FP,
                           mixed_precision=(4, 8))
    res = plan.resolver()

    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((1, 4, 4, 8, 8)), jnp.float32)
    y_c = jnp.asarray(rng.standard_normal((1, 1, 8, 32)), jnp.float32)
    y = jnp.concatenate([y_c, y_c * 0], axis=0)
    mask = jnp.ones((1, 8), jnp.int32)
    kw = dict(input_size=(4, 8, 8), in_channels=4, patch_size=(1, 2, 2),
              hidden_size=64, depth=2, num_heads=4, caption_channels=32,
              model_max_length=8, dtype=jnp.float32)

    def ctor(r):
        return STDiT(scan_blocks=True, resolver=r or (lambda n: None), **kw)

    un = STDiT(scan_blocks=False, resolver=res, **kw)
    v_un = dict(un.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)), y[:1],
                        mask, QuantCtx(mode="fp")))
    for t_id in (100, 900):
        _, muts = un.apply(
            v_un, z, jnp.full((1,), float(t_id)), y[:1], mask,
            QuantCtx(mode="sq_stat", t_id=jnp.asarray(t_id, jnp.int32)),
            mutable=["quant", "qstats"])
        v_un["quant"] = muts["quant"]
        v_un["qstats"] = muts["qstats"]
    v_un["quant"] = calibrate_weight_tables(v_un["params"], v_un["quant"],
                                            res)
    v_un["quant"] = pack_native_weights(v_un["params"], v_un["quant"], res)
    v_sc = _stack_all(v_un, 2)

    mp_weight = {"3-2": {"model.blocks.0.attn.q": 8,
                         "model.blocks.0.mlp.fc1": 8},
                 "1-0": {"model.blocks.0.attn.q": 4}}
    sampler = IDDPM(num_sampling_steps=4, cfg_scale=4.0)

    fn_g = build_mp_sampler_gather(ctor, sampler, plan, mp_weight, None,
                                   static_segments=False)
    fn_s = build_mp_sampler_gather(ctor, sampler, plan, mp_weight, None,
                                   static_segments=True)
    assert fn_g is not None and fn_s is not None
    out_g = np.asarray(fn_g(v_sc, z, y, mask))
    out_s = np.asarray(fn_s(v_sc, z, y, mask))
    assert np.isfinite(out_s).all()
    np.testing.assert_allclose(out_s, out_g, rtol=0, atol=1e-5)
