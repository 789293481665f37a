"""scan_blocks (stacked block stack) equivalence tests."""

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
