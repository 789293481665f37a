"""Layer-level tests: QuantLinear modes, calibration flow, smooth quant,
name-pattern resolution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from viditq_tpu.quant import (
    LayerQuantSpec, QuantSpec, SmoothQuantSpec, QuantCtx, QuantLinear,
    calibrate_weight_tables, finalize_act_tables, pattern_in,
    resolve_layer_spec, quant_params_dict, load_quant_params_dict)

W8 = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
               round_mode="nearest")
A8_DYN = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
                   dynamic=True)
A8_STATIC = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
                      running_stat=True, timestep_wise=True, n_timestep=2)


def make_layer(lspec, features=32, **kw):
    layer = QuantLinear(features=features, lspec=lspec, dtype=jnp.float32,
                        **kw)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16, 24)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp"))
    return layer, variables, x


def test_fp_mode_is_plain_dense():
    lspec = LayerQuantSpec(weight=W8, act=A8_DYN)
    layer, variables, x = make_layer(lspec)
    y_fp = layer.apply(variables, x, QuantCtx(mode="fp"))
    y_none = layer.apply(variables, x, None)
    np.testing.assert_array_equal(np.asarray(y_fp), np.asarray(y_none))


def test_dynamic_w8a8_close_to_fp():
    lspec = LayerQuantSpec(weight=W8, act=A8_DYN)
    layer, variables, x = make_layer(lspec)
    resolve = lambda name: lspec
    variables = dict(variables)
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolve)
    y_fp = layer.apply(variables, x, QuantCtx(mode="fp"))
    y_q = layer.apply(variables, x, QuantCtx(mode="quant"))
    rel = np.linalg.norm(np.asarray(y_q - y_fp)) / np.linalg.norm(np.asarray(y_fp))
    assert 0 < rel < 0.02  # 8-bit fake quant error is small but nonzero


def test_static_act_calibration_flow():
    lspec = LayerQuantSpec(weight=W8, act=A8_STATIC)
    layer, variables, x = make_layer(lspec)
    resolve = lambda name: lspec
    variables = dict(variables)
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolve)
    # act-calib forwards for both slots
    for slot in (0, 1):
        for xb in (x, x * 1.1):
            _, upd = layer.apply(
                variables, xb,
                QuantCtx(mode="a_calib", act_slot=jnp.asarray(slot)),
                mutable=["qstats"])
            variables["qstats"] = upd["qstats"]
    assert bool(np.all(np.asarray(variables["qstats"]["a_init"])))
    variables["quant"] = finalize_act_tables(
        variables["quant"], variables["qstats"], resolve)
    assert np.all(np.asarray(variables["quant"]["a_delta"]) > 0)
    y_fp = layer.apply(variables, x, QuantCtx(mode="fp"))
    y_q = layer.apply(variables, x,
                      QuantCtx(mode="quant", act_slot=jnp.asarray(0)))
    rel = np.linalg.norm(np.asarray(y_q - y_fp)) / np.linalg.norm(np.asarray(y_fp))
    assert rel < 0.05


@pytest.mark.parametrize("frozen", [True, False],
                         ids=["frozen-tr0", "corrected"])
def test_smooth_quant_stats_and_inference(frozen):
    """frozen=True is the reference's runtime semantics (weight qparams
    frozen at timerange 0, base_quantizer.py:126-134 — see
    SmoothQuantSpec.frozen_tr0_weights); frozen=False is the
    self-consistent per-timerange mode. The corrected mode must be close
    to fp in BOTH timeranges; the frozen mode only in timerange 0 (its
    tr1 error is exactly the landmine's cost, asserted bounded)."""
    sq = SmoothQuantSpec(enable=True, alpha=(0.5, 0.5),
                         timerange=((0, 500), (501, 1000)),
                         frozen_tr0_weights=frozen)
    lspec = LayerQuantSpec(weight=W8, act=A8_DYN, smooth_quant=sq)
    layer, variables, x = make_layer(lspec)
    variables = dict(variables)
    # stat passes in both timeranges
    for t, seed in ((100, 1), (100, 2), (800, 3)):
        _, upd = layer.apply(
            variables, x * (seed + 1),
            QuantCtx(mode="sq_stat", t_id=jnp.asarray(t)),
            mutable=["quant", "qstats"])
        variables["quant"] = upd["quant"]
        variables["qstats"] = upd["qstats"]
    scale = np.asarray(variables["quant"]["act_scale"])
    assert np.all(scale > 0)
    assert not np.allclose(scale[0], scale[1])
    resolve = lambda name: lspec
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolve)
    y_fp = layer.apply(variables, x, QuantCtx(mode="fp"))
    rels = {}
    for t in (100, 900):
        y_q = layer.apply(variables, x,
                          QuantCtx(mode="quant", t_id=jnp.asarray(t)))
        rels[t] = (np.linalg.norm(np.asarray(y_q - y_fp))
                   / np.linalg.norm(np.asarray(y_fp)))
    assert rels[100] < 0.02, rels
    if frozen:
        # the landmine's cost: tr1's weight is quantized with tr0's
        # qparams; this synthetic calib makes the act stats differ ~2x
        # between trs, so the error is large — assert its signature
        # (clearly worse than tr0) and an upper bound
        assert rels[100] < rels[900] < 0.25, rels
    else:
        assert rels[900] < 0.02, rels


def test_smooth_quant_momentum_matches_reference_update():
    sq = SmoothQuantSpec(enable=True, alpha=(0.5,), momentum=0.9,
                         timerange=((0, 1000),))
    lspec = LayerQuantSpec(weight=W8, act=A8_DYN, smooth_quant=sq)
    layer, variables, x = make_layer(lspec)
    variables = dict(variables)
    xs = [x, x * 2.0]
    expected = None
    for xb in xs:
        cur = np.abs(np.asarray(xb)).max(axis=-2).mean(axis=0)
        expected = cur if expected is None else expected * 0.9 + cur * 0.1
        _, upd = layer.apply(variables, xb, QuantCtx(mode="sq_stat"),
                             mutable=["quant", "qstats"])
        variables["quant"] = upd["quant"]
        variables["qstats"] = upd["qstats"]
    np.testing.assert_allclose(
        np.asarray(variables["quant"]["act_scale"][0]), expected, rtol=1e-5)


def test_token_layout_spatial_roundtrip():
    lspec = LayerQuantSpec(weight=None, act=A8_DYN, weight_quant=False)
    layer = QuantLinear(features=8, lspec=lspec, dtype=jnp.float32,
                        token_layout="spatial", d_t=4, d_s=16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2 * 4, 16, 12)).astype(np.float32))  # [(B T), S, C]
    variables = layer.init(jax.random.PRNGKey(0), x, QuantCtx(mode="quant"))
    y = layer.apply(variables, x, QuantCtx(mode="quant"))
    assert y.shape == (8, 16, 8)
    # per-token quant on the [B, T*S, C] view differs from naive per-token on
    # the raw [(B T), S, C] view — verify the layout actually matters
    from viditq_tpu.quant import core
    xv = x.reshape(2, 64, 12)
    want = core.fake_quant_dynamic(xv, A8_DYN).reshape(8, 16, 12)
    got_in = want @ np.asarray(variables["params"]["kernel"]) + np.asarray(
        variables["params"]["bias"])
    np.testing.assert_allclose(np.asarray(y), got_in, rtol=1e-4, atol=1e-4)


def test_pattern_matching_reference_cases():
    assert pattern_in("blocks.0.attn.q", "blocks.[0-13].attn.q")
    assert not pattern_in("blocks.14.attn.q", "blocks.[0-13].attn.q")
    assert pattern_in("blocks.5.cross_attn.kv_linear", "cross_attn")
    assert pattern_in("final_layer.linear", "final_layer")
    assert pattern_in("blocks.3.mlp.fc2", "blocks.*.mlp.fc2")
    assert not pattern_in("blocks.3.mlp.fc2", "blocks.*.mlp.fc1")
    assert pattern_in("x_embedder.proj", "x_embedder")


def test_resolve_layer_spec_fp_list():
    default = LayerQuantSpec(weight=W8, act=A8_DYN)
    fp = ("x_embedder", "t_block", "t_embedder", "y_embedder", "final_layer")
    spec = resolve_layer_spec("final_layer.linear", default, fp)
    assert not spec.weight_quant and not spec.act_quant
    spec = resolve_layer_spec("blocks.0.attn.q", default, fp)
    assert spec.weight_quant and spec.act_quant


def test_quant_params_dict_roundtrip():
    lspec = LayerQuantSpec(weight=W8, act=A8_DYN)
    layer, variables, x = make_layer(lspec)
    resolve = lambda name: lspec
    qv = calibrate_weight_tables(variables["params"], variables["quant"],
                                 resolve)
    packed = quant_params_dict(qv)
    blank = jax.tree.map(jnp.zeros_like, qv)
    restored = load_quant_params_dict(blank, packed)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored)[0]),
        np.asarray(jax.tree.leaves(qv)[0]))


def test_attention_internal_quantizers():
    """QKV-act + softmax quantizers (reference QuantTransformerBlock)."""
    import dataclasses
    from viditq_tpu.models.layers import SelfAttention
    a8 = QuantSpec(n_bits=8, granularity="token", round_mode="nearest",
                   dynamic=True)
    sm4 = QuantSpec(n_bits=4, granularity="tensor", round_mode="nearest",
                    always_zero=True, dynamic=True)
    base = LayerQuantSpec(weight=W8, act=A8_DYN, attn_act=a8, softmax=sm4)
    resolver = lambda n: base
    attn = SelfAttention(32, num_heads=4, resolver=resolver, prefix="attn",
                         dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 32)),
                    jnp.float32)
    vs = attn.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp"))
    from viditq_tpu.quant import calibrate_weight_tables
    vs = dict(vs)
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"], resolver)
    out_fp = attn.apply(vs, x, QuantCtx(mode="fp"))
    out_q = attn.apply(vs, x, QuantCtx(mode="quant"))
    assert np.isfinite(np.asarray(out_q)).all()
    # 4-bit softmax quant must measurably change the output vs fp
    rel = (np.linalg.norm(np.asarray(out_q - out_fp))
           / np.linalg.norm(np.asarray(out_fp)))
    assert 1e-4 < rel < 0.5, rel
    # and differ from the no-attn-quant variant
    base2 = LayerQuantSpec(weight=W8, act=A8_DYN)
    attn2 = SelfAttention(32, num_heads=4, resolver=lambda n: base2,
                          prefix="attn", dtype=jnp.float32)
    out_q2 = attn2.apply(vs, x, QuantCtx(mode="quant"))
    assert np.abs(np.asarray(out_q2 - out_q)).max() > 1e-6


def test_quant_conv():
    from viditq_tpu.quant.qlinear import QuantConv
    lspec = LayerQuantSpec(weight=W8, act=A8_DYN)
    conv = QuantConv(features=16, kernel_size=(3, 3), strides=(1, 1),
                     padding="SAME", lspec=lspec, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4)),
                    jnp.float32)
    vs = dict(conv.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp")))
    from viditq_tpu.quant.calibrate import calibrate_weight_tables
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"],
                                          lambda n: lspec)
    out_fp = conv.apply(vs, x, QuantCtx(mode="fp"))
    out_q = conv.apply(vs, x, QuantCtx(mode="quant"))
    assert out_fp.shape == (2, 8, 8, 16)
    rel = (np.linalg.norm(np.asarray(out_q - out_fp))
           / np.linalg.norm(np.asarray(out_fp)))
    assert 0 < rel < 0.05, rel


def test_channel_split_quant():
    """q-diffusion legacy split: separate quantizer groups per channel half."""
    import dataclasses
    lspec = dataclasses.replace(LayerQuantSpec(weight=W8, act=A8_DYN),
                                split=12)
    layer, variables, x = make_layer(lspec)
    y_fp = layer.apply(variables, x, QuantCtx(mode="fp"))
    y_q = layer.apply(variables, x, QuantCtx(mode="quant"))
    rel = np.linalg.norm(np.asarray(y_q - y_fp)) / np.linalg.norm(
        np.asarray(y_fp))
    assert 0 < rel < 0.02
    # split changes the result vs unsplit (different quant groups)
    layer2, v2, _ = make_layer(LayerQuantSpec(weight=W8, act=A8_DYN))
    v2 = dict(v2)
    v2["params"] = variables["params"]
    from viditq_tpu.quant import calibrate_weight_tables
    v2["quant"] = calibrate_weight_tables(
        v2["params"], v2["quant"], lambda n: LayerQuantSpec(weight=W8,
                                                            act=A8_DYN))
    y_q2 = layer2.apply(v2, x, QuantCtx(mode="quant"))
    assert np.abs(np.asarray(y_q2 - y_q)).max() > 1e-7


def test_quant_conv_full_parity_with_linear():
    """QuantConv == im2col + QuantLinear (the shared _quant_forward):
    calibrated tables, AdaRound alphas and the native weight-only path all
    apply to convs (reference conv wrapping, quant_layer.py:34-45)."""
    from viditq_tpu.quant.qlinear import QuantConv, QuantLinear
    from viditq_tpu.quant.calibrate import calibrate_weight_tables

    lspec = LayerQuantSpec(weight=W8, act=A8_DYN)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    conv = QuantConv(features=16, kernel_size=(2, 2), lspec=lspec,
                     dtype=jnp.float32)
    vs = conv.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp"))
    assert vs["params"]["kernel"].shape == (2, 2, 4, 16)  # conv layout
    # calibrated tables work on the conv-layout kernel
    resolver = lambda n: lspec  # noqa: E731
    vs = dict(vs)
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"],
                                          resolver)
    out_q = conv.apply(vs, x, QuantCtx(mode="quant"))
    assert out_q.shape == (2, 4, 4, 16)

    # identical math through QuantLinear on hand-im2col'd patches
    lin = QuantLinear(features=16, lspec=lspec, dtype=jnp.float32)
    patches = x.reshape(2, 4, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(2, 16, 16)
    lvs = {"params": {"kernel": vs["params"]["kernel"].reshape(16, 16),
                      "bias": vs["params"]["bias"]}}
    lvs = dict(lin.init(jax.random.PRNGKey(0), patches, QuantCtx(mode="fp")),
               **lvs)
    lvs["quant"] = calibrate_weight_tables(lvs["params"], lvs["quant"],
                                           resolver)
    out_lin = lin.apply(lvs, patches, QuantCtx(mode="quant"))
    np.testing.assert_allclose(
        np.asarray(out_q).reshape(2, 16, 16), np.asarray(out_lin),
        rtol=1e-5, atol=1e-5)


def test_quant_conv_weight_only_native():
    """Conv weight-only native: int8-stored weights + packing."""
    import dataclasses as dc
    from viditq_tpu.quant.qlinear import QuantConv
    from viditq_tpu.quant.calibrate import calibrate_weight_tables
    from viditq_tpu.quant.native_pack import pack_native_weights

    lspec = dc.replace(LayerQuantSpec(weight=W8, act=None, act_quant=False),
                       backend="native")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    conv = QuantConv(features=16, kernel_size=(2, 2), lspec=lspec,
                     dtype=jnp.float32)
    vs = dict(conv.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp")))
    resolver = lambda n: lspec  # noqa: E731
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"],
                                          resolver)
    assert "w_int" in vs["quant"]
    vs["quant"] = pack_native_weights({"": vs["params"]},
                                      {"": vs["quant"]}, resolver)[""]
    out_fp = conv.apply(vs, x, QuantCtx(mode="fp"))
    out_q = conv.apply(vs, x, QuantCtx(mode="quant"))
    rel = (np.linalg.norm(np.asarray(out_q - out_fp))
           / np.linalg.norm(np.asarray(out_fp)))
    assert 0 < rel < 0.05, rel


def test_quant_conv_general_stride_matches_xla_conv():
    """Non-patchify (overlapping) convs route through
    conv_general_dilated_patches with the channel reorder."""
    from viditq_tpu.quant.qlinear import QuantConv
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 9, 9, 3)), jnp.float32)
    conv = QuantConv(features=8, kernel_size=(3, 3), strides=(2, 2),
                     padding="SAME", lspec=None, dtype=jnp.float32)
    vs = conv.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp"))
    got = conv.apply(vs, x, QuantCtx(mode="fp"))
    want = jax.lax.conv_general_dilated(
        x, vs["params"]["kernel"], window_strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want = want + vs["params"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_stdit_quantized_patch_embed():
    """A plan that takes x_embedder off the fp list quantizes the patchify
    conv through the full pipeline."""
    from viditq_tpu.models import STDiT
    from viditq_tpu.quant import (QuantCtx as QC, calibrate_weight_tables,
                                  resolve_layer_spec)
    base = LayerQuantSpec(weight=W8, act=A8_DYN)
    fp = ("t_embedder", "t_block", "y_embedder", "final_layer")
    resolver = lambda n: resolve_layer_spec(n, base, fp)  # noqa: E731
    model = STDiT(input_size=(2, 8, 8), in_channels=4, patch_size=(1, 2, 2),
                  hidden_size=32, depth=1, num_heads=4, caption_channels=16,
                  model_max_length=4, dtype=jnp.float32, resolver=resolver)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 2, 8, 8)), jnp.float32)
    t = jnp.asarray([10.0, 20.0])
    y = jnp.asarray(rng.standard_normal((2, 1, 4, 16)), jnp.float32)
    vs = dict(model.init(jax.random.PRNGKey(0), x, t, y, None,
                         qctx=QC(mode="fp")))
    assert "proj" in vs["quant"]["x_embedder"], "patch embed must quantize"
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"],
                                          resolver)
    out_fp = model.apply(vs, x, t, y, None, qctx=QC(mode="fp"))
    out_q = model.apply(vs, x, t, y, None, qctx=QC(mode="quant"))
    rel = (np.linalg.norm(np.asarray(out_q - out_fp))
           / np.linalg.norm(np.asarray(out_fp)))
    assert 0 < rel < 0.2, rel


def test_fp_and_quantized_builds_init_identically():
    """Same seed => same params whether or not a resolver is attached, for
    every plan that keeps x_embedder on the fp list (regression: routing
    fp-list patch embeds through QuantConv changed the kernel initializer,
    silently diverging the FP and quant arms on random weights)."""
    from viditq_tpu.models import STDiT
    from viditq_tpu.quant import QuantCtx as QC
    from viditq_tpu.utils.config import load_quant_config

    plan = load_quant_config("configs/opensora/w8a8_dynamic.yaml")
    kw = dict(input_size=(2, 8, 8), in_channels=4, patch_size=(1, 2, 2),
              hidden_size=32, depth=1, num_heads=4, caption_channels=16,
              model_max_length=4, dtype=jnp.float32)
    m_fp = STDiT(**kw)
    m_q = STDiT(resolver=plan.resolver(), **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 2, 8, 8)), jnp.float32)
    t = jnp.asarray([10.0, 20.0])
    y = jnp.asarray(rng.standard_normal((2, 1, 4, 16)), jnp.float32)
    v_fp = m_fp.init(jax.random.PRNGKey(0), x, t, y, None)
    v_q = m_q.init(jax.random.PRNGKey(0), x, t, y, None, qctx=QC(mode="fp"))
    flat_fp = {".".join(k): v for k, v in
               __import__("flax").traverse_util.flatten_dict(
                   v_fp["params"]).items()}
    flat_q = {".".join(k): v for k, v in
              __import__("flax").traverse_util.flatten_dict(
                  v_q["params"]).items()}
    assert set(flat_fp) == set(flat_q)
    for k in flat_fp:
        np.testing.assert_array_equal(np.asarray(flat_fp[k]),
                                      np.asarray(flat_q[k]), err_msg=k)
