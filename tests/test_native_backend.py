"""Native int8 backend end-to-end: simulate-calibrated variables drive a
backend='native' model; outputs match the simulated path closely (native
per-row act scales are finer than the reference's batch-shared per-token
scales, so exact equality is not expected at batch>1)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from viditq_tpu.models import PixArt
from viditq_tpu.quant import (
    LayerQuantSpec, QuantSpec, QuantCtx, calibrate_weight_tables,
    resolve_layer_spec)
from viditq_tpu.quant.native_pack import add_native_slots, pack_native_weights

W8 = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
               round_mode="nearest")
A8 = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
               dynamic=True)
SIM = LayerQuantSpec(weight=W8, act=A8, backend="simulate")
NAT = dataclasses.replace(SIM, backend="native")
FP = ("x_embedder", "t_embedder", "y_embedder", "final_layer")


def sim_resolver(name):
    return resolve_layer_spec(name, SIM, FP)


def nat_resolver(name):
    return resolve_layer_spec(name, NAT, FP)


def test_native_pixart_matches_simulate():
    kw = dict(input_size=8, patch_size=2, in_channels=4, hidden_size=64,
              depth=2, num_heads=4, caption_channels=32, model_max_length=8,
              dtype=jnp.float32)
    model_sim = PixArt(resolver=sim_resolver, **kw)
    model_nat = PixArt(resolver=nat_resolver, **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([100.0])
    y = jnp.asarray(rng.standard_normal((1, 1, 8, 32)), jnp.float32)
    mask = jnp.ones((1, 8), jnp.int32)

    variables = model_sim.init(jax.random.PRNGKey(0), x, t, y, mask,
                               qctx=QuantCtx(mode="fp"))
    variables = dict(variables)
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], sim_resolver)
    out_sim = model_sim.apply(variables, x, t, y, mask,
                              qctx=QuantCtx(mode="quant"))

    variables["quant"] = add_native_slots(variables["quant"],
                                          variables["params"], nat_resolver)
    variables["quant"] = pack_native_weights(
        variables["params"], variables["quant"], nat_resolver)
    out_nat = model_nat.apply(variables, x, t, y, mask,
                              qctx=QuantCtx(mode="quant"))
    out_fp = model_sim.apply(variables, x, t, y, mask,
                             qctx=QuantCtx(mode="fp"))
    # batch=1: per-row == per-token — paths should agree tightly
    rel_paths = (np.linalg.norm(np.asarray(out_nat - out_sim))
                 / np.linalg.norm(np.asarray(out_sim)))
    assert rel_paths < 0.02, rel_paths
    # and native stays close to FP overall
    rel_fp = (np.linalg.norm(np.asarray(out_nat - out_fp))
              / np.linalg.norm(np.asarray(out_fp)))
    assert rel_fp < 0.15, rel_fp


def test_weight_only_native_matches_fake_quant():
    """int8-stored weights + bf16 matmul (W8 weight-only) == simulated
    weight-only fake quant."""
    wo = dataclasses.replace(SIM, backend="native", act=None, act_quant=False)
    resolver = lambda n: wo
    from viditq_tpu.quant import QuantLinear
    layer_n = QuantLinear(features=32, lspec=wo, dtype=jnp.float32)
    layer_s = QuantLinear(
        features=32, lspec=dataclasses.replace(wo, backend="simulate"),
        dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 24)),
                    jnp.float32)
    vs = dict(layer_n.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp")))
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"], resolver)
    vs["quant"] = add_native_slots(vs["quant"], vs["params"], resolver)
    vs["quant"] = pack_native_weights(vs["params"], vs["quant"], resolver)
    out_n = layer_n.apply(vs, x, QuantCtx(mode="quant"))
    out_s = layer_s.apply(vs, x, QuantCtx(mode="quant"))
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)


def test_weight_only_int4_bitpacked():
    """int4 weight-only: two codes per byte (8x memory), matches simulated
    W4 weight-only fake quant."""
    from viditq_tpu.quant import QuantLinear
    w4 = QuantSpec(n_bits=4, granularity="channel", channel_axis=-1,
                   round_mode="nearest")
    wo = LayerQuantSpec(weight=w4, act=None, act_quant=False,
                        backend="native")
    resolver = lambda n: wo
    layer_n = QuantLinear(features=32, lspec=wo, dtype=jnp.float32)
    layer_s = QuantLinear(
        features=32, lspec=dataclasses.replace(wo, backend="simulate"),
        dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 24)),
                    jnp.float32)
    vs = dict(layer_n.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp")))
    assert vs["quant"]["w_int"].shape == (1, 12, 32)  # 24 rows -> 12 bytes
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"], resolver)
    vs["quant"] = pack_native_weights(vs["params"], vs["quant"], resolver)
    out_n = layer_n.apply(vs, x, QuantCtx(mode="quant"))
    out_s = layer_s.apply(vs, x, QuantCtx(mode="quant"))
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)


def test_static_act_native_matches_simulate():
    """Static per-token acts + symmetric weights: the fastest native path;
    must match the simulated static path."""
    from viditq_tpu.quant import (QuantLinear, finalize_act_tables)
    w8s = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
                    round_mode="nearest", sym=True)
    a8s = QuantSpec(n_bits=8, granularity="token", round_mode="nearest",
                    running_stat=True, timestep_wise=True, n_timestep=2)
    spec_nat = LayerQuantSpec(weight=w8s, act=a8s, backend="native")
    spec_sim = dataclasses.replace(spec_nat, backend="simulate")
    res_nat = lambda n: spec_nat
    res_sim = lambda n: spec_sim
    layer_n = QuantLinear(features=32, lspec=spec_nat, dtype=jnp.float32)
    layer_s = QuantLinear(features=32, lspec=spec_sim, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 24)),
                    jnp.float32)
    vs = dict(layer_n.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp")))
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"], res_nat)
    # act range calib for both slots
    for slot in (0, 1):
        for xb in (x, x * 1.1):
            _, upd = layer_n.apply(
                vs, xb, QuantCtx(mode="a_calib", act_slot=jnp.asarray(slot)),
                mutable=["qstats"])
            vs["qstats"] = upd["qstats"]
    vs["quant"] = finalize_act_tables(vs["quant"], vs["qstats"], res_nat)
    vs["quant"] = pack_native_weights(vs["params"], vs["quant"], res_nat)
    qctx = QuantCtx(mode="quant", act_slot=jnp.asarray(1))
    out_n = layer_n.apply(vs, x, qctx)
    out_s = layer_s.apply(vs, x, qctx)
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_s),
                               rtol=1e-4, atol=1e-4)


def test_static_act_native_asym_weights():
    from viditq_tpu.quant import QuantLinear, finalize_act_tables
    w8 = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
                   round_mode="nearest")
    a8s = QuantSpec(n_bits=8, granularity="token", round_mode="nearest",
                    running_stat=True, timestep_wise=True, n_timestep=1)
    spec_nat = LayerQuantSpec(weight=w8, act=a8s, backend="native")
    spec_sim = dataclasses.replace(spec_nat, backend="simulate")
    res = lambda n: spec_nat
    layer_n = QuantLinear(features=16, lspec=spec_nat, dtype=jnp.float32)
    layer_s = QuantLinear(features=16, lspec=spec_sim, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, 12)),
                    jnp.float32)
    vs = dict(layer_n.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp")))
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"], res)
    _, upd = layer_n.apply(vs, x, QuantCtx(mode="a_calib"),
                           mutable=["qstats"])
    vs["qstats"] = upd["qstats"]
    vs["quant"] = finalize_act_tables(vs["quant"], vs["qstats"], res)
    vs["quant"] = pack_native_weights(vs["params"], vs["quant"], res)
    out_n = layer_n.apply(vs, x, QuantCtx(mode="quant"))
    out_s = layer_s.apply(vs, x, QuantCtx(mode="quant"))
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_s),
                               rtol=1e-4, atol=1e-4)


def test_weight_only_native_sym_int8():
    """Symmetric weight-only: slabs store unshifted signed codes (zp=0);
    dequant must not apply the asym shift (round-1 advisor finding)."""
    from viditq_tpu.quant import QuantLinear
    w8s = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
                    round_mode="nearest", sym=True)
    wo = LayerQuantSpec(weight=w8s, act=None, act_quant=False,
                        backend="native")
    resolver = lambda n: wo
    layer_n = QuantLinear(features=32, lspec=wo, dtype=jnp.float32)
    layer_s = QuantLinear(
        features=32, lspec=dataclasses.replace(wo, backend="simulate"),
        dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 16, 24)),
                    jnp.float32)
    vs = dict(layer_n.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp")))
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"], resolver)
    vs["quant"] = pack_native_weights(vs["params"], vs["quant"], resolver)
    out_n = layer_n.apply(vs, x, QuantCtx(mode="quant"))
    out_s = layer_s.apply(vs, x, QuantCtx(mode="quant"))
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)


def test_weight_only_native_sym_int4_not_packed():
    """Symmetric int4 weight-only must NOT bit-pack (nibbles are unsigned):
    slab shape stays full-row and outputs match the simulated path."""
    from viditq_tpu.quant import QuantLinear
    w4s = QuantSpec(n_bits=4, granularity="channel", channel_axis=-1,
                    round_mode="nearest", sym=True)
    wo = LayerQuantSpec(weight=w4s, act=None, act_quant=False,
                        backend="native")
    resolver = lambda n: wo
    layer_n = QuantLinear(features=32, lspec=wo, dtype=jnp.float32)
    layer_s = QuantLinear(
        features=32, lspec=dataclasses.replace(wo, backend="simulate"),
        dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 16, 24)),
                    jnp.float32)
    vs = dict(layer_n.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp")))
    assert vs["quant"]["w_int"].shape == (1, 24, 32)  # full rows, no packing
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"], resolver)
    vs["quant"] = pack_native_weights(vs["params"], vs["quant"], resolver)
    out_n = layer_n.apply(vs, x, QuantCtx(mode="quant"))
    out_s = layer_s.apply(vs, x, QuantCtx(mode="quant"))
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)


def test_native_rejects_sub8bit_dynamic_acts():
    import pytest
    from viditq_tpu.quant import QuantLinear
    a6 = dataclasses.replace(A8, n_bits=6)
    spec = LayerQuantSpec(weight=W8, act=a6, backend="native")
    layer = QuantLinear(features=16, lspec=spec, dtype=jnp.float32)
    x = jnp.zeros((1, 4, 8), jnp.float32)
    vs = layer.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp"))
    with pytest.raises(ValueError, match="8-bit"):
        layer.apply(vs, x, QuantCtx(mode="quant"))


def test_fused_impl_linear_matches_xla_native(monkeypatch):
    """impl='fused' (single-Pallas-kernel dataflow, interpret mode on CPU)
    == the XLA native path bit-for-bit (same quantization math)."""
    from jax.experimental.pallas import tpu as pltpu
    from viditq_tpu.quant import QuantLinear

    monkeypatch.setenv("VIDITQ_FORCE_FUSED", "1")
    for sym_a, sym_w in [(True, True), (True, False), (False, False)]:
        w = dataclasses.replace(W8, sym=sym_w)
        a = dataclasses.replace(A8, sym=sym_a)
        nat = LayerQuantSpec(weight=w, act=a, backend="native")
        fus = dataclasses.replace(nat, impl="fused")
        res_n = lambda n: nat
        res_f = lambda n: fus
        layer_n = QuantLinear(features=32, lspec=nat, dtype=jnp.float32)
        layer_f = QuantLinear(features=32, lspec=fus, dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 16, 24)),
                        jnp.float32)
        vs = dict(layer_n.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp")))
        vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"], res_n)
        vs["quant"] = pack_native_weights(vs["params"], vs["quant"], res_n)
        out_n = layer_n.apply(vs, x, QuantCtx(mode="quant"))
        with pltpu.force_tpu_interpret_mode():
            out_f = layer_f.apply(vs, x, QuantCtx(mode="quant"))
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"sym_a={sym_a} sym_w={sym_w}")


def test_native_pack_honors_adaround_alphas():
    """Packed int codes must use AdaRound's LEARNED hard rounding
    (floor + (alpha >= 0)), not nearest — otherwise the native backend
    silently discards the reconstruction result (round-2 fix)."""
    from flax.core import FrozenDict
    from viditq_tpu.quant import core
    from viditq_tpu.quant.qlinear import QuantLinear

    WAD = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
                    round_mode="learned_hard_sigmoid")
    spec = LayerQuantSpec(weight=WAD, act=A8, backend="native")
    rng = np.random.default_rng(0)
    lin = QuantLinear(16, lspec=spec, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 12)), jnp.float32)
    vs = dict(lin.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp")))
    resolver = lambda n: spec
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"],
                                          resolver)
    # force a non-trivial alpha pattern: half the entries round the
    # "wrong" way vs nearest
    alpha = jnp.asarray(rng.standard_normal((12, 16)), jnp.float32)
    q = dict(jax.tree_util.tree_map(lambda v: v, vs["quant"]))
    q["w_alpha"] = alpha
    vs["quant"] = q
    vs["quant"] = pack_native_weights(vs["params"], vs["quant"], resolver)

    kernel = np.asarray(vs["params"]["kernel"], np.float32)
    delta = np.asarray(vs["quant"]["w_delta"])[WAD.bit_idx, 0]  # [1, F]
    codes = np.asarray(vs["quant"]["w_int"][0], np.float32)
    zp = np.asarray(vs["quant"]["w_zp"])[WAD.bit_idx, 0]
    shift = 2.0 ** (WAD.n_bits - 1)
    # expected: floor(w/d) + (alpha>=0), clipped, shifted into signed int8
    scaled = kernel / delta
    want = np.floor(scaled) + (np.asarray(alpha) >= 0)
    want = np.clip(want + zp, 0, 2.0 ** WAD.n_bits - 1) - shift
    np.testing.assert_array_equal(codes, want)
    # and it must DIFFER from nearest rounding somewhere
    nearest = np.clip(np.round(scaled) + zp, 0, 255) - shift
    assert (codes != nearest).any()


@pytest.mark.heavy
def test_cb_qkv_share_pooled_tables_and_quality():
    """SmoothQuantSpec.qkv_share_cs: q/k/v pool one balancing scale (the
    upstream fused-qkv granularity, blocks.py:143), the parent-scope
    cbshare copies are filled, and e2e quality stays at the per-layer-CB
    level."""
    from viditq_tpu.models import STDiT
    from viditq_tpu.quant import resolve_layer_spec
    from viditq_tpu.quant.spec import SmoothQuantSpec
    from flax import traverse_util

    W4 = QuantSpec(n_bits=4, granularity="channel", channel_axis=-1,
                   round_mode="nearest", mixed_precision=(4, 8))
    FPS = ("x_embedder", "t_block", "t_embedder", "y_embedder",
           "final_layer")

    def mk(share):
        sq = SmoothQuantSpec(enable=True,
                             channel_wise_scale_type="momentum_act_max",
                             alpha=(0.11, 0.11),
                             timerange=((0, 500), (501, 1000)),
                             qkv_share_cs=share)
        base = LayerQuantSpec(weight=W4, act=A8, smooth_quant=sq,
                              backend="native")
        return lambda n: resolve_layer_spec(n, base, FPS)

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 4, 4, 8, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 1, 8, 32)), jnp.float32)
    mask = jnp.ones((1, 8), jnp.int32)
    kw = dict(input_size=(4, 8, 8), in_channels=4, patch_size=(1, 2, 2),
              hidden_size=64, depth=2, num_heads=4, caption_channels=32,
              model_max_length=8, dtype=jnp.float32)
    x2 = jnp.concatenate([z, z])
    t2 = jnp.zeros((2,))

    rels = {}
    for share in (False, True):
        res = mk(share)
        m = STDiT(resolver=res, **kw)
        vs = dict(m.init(jax.random.PRNGKey(0), x2, t2, y, mask,
                         QuantCtx(mode="fp")))
        for t_id in (100, 900):
            _, muts = m.apply(
                vs, x2, jnp.full((2,), float(t_id)), y, mask,
                QuantCtx(mode="sq_stat", t_id=jnp.asarray(t_id, jnp.int32)),
                mutable=["quant", "qstats"])
            vs["quant"] = muts["quant"]
            vs["qstats"] = muts["qstats"]
        vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"], res)
        vs["quant"] = pack_native_weights(vs["params"], vs["quant"], res)
        out_fp = m.apply(vs, x2, t2, y, mask, QuantCtx(mode="fp"))
        out_q = m.apply(vs, x2, t2, y, mask,
                        QuantCtx(mode="quant", t_id=jnp.asarray(300)))
        rels[share] = float(jnp.linalg.norm(out_q - out_fp)
                            / jnp.linalg.norm(out_fp))
        if share:
            flat = traverse_util.flatten_dict(vs["quant"])
            cbs = [p for p in flat if p[-1].startswith("cbshare__")]
            assert cbs, "no cbshare tables declared under qkv_share_cs"
            for p in cbs:
                assert float(jnp.abs(flat[p]).max()) > 0, p
            # pooled: q/k/v tables are identical
            b0 = ("blocks_0", "attn")
            np.testing.assert_allclose(
                np.asarray(flat[b0 + ("q", "cb_scale")]),
                np.asarray(flat[b0 + ("k", "cb_scale")]))
            np.testing.assert_allclose(
                np.asarray(flat[b0 + ("q", "cb_scale")]),
                np.asarray(flat[b0 + ("v", "cb_scale")]))
            # and equal the attention-scope shared copy
            np.testing.assert_allclose(
                np.asarray(flat[b0 + ("cbshare__q",)]),
                np.asarray(flat[b0 + ("q", "cb_scale")]))
    # pooling is a mild granularity change, not a quality cliff
    assert rels[True] < rels[False] * 1.25 + 0.01, rels


@pytest.mark.heavy
def test_cb_share_producer_bitexact_vs_unfused(monkeypatch):
    """With qkv_share_cs, the block's LN+modulate+quantize producer (1/cs
    folded into the adaLN vectors) and the gelu->fc2 handoff re-engage
    under CB and match the producer-disabled path exactly (interpret
    mode)."""
    import os
    from jax.experimental.pallas import tpu as pltpu
    from viditq_tpu.models.stdit import STDiTBlock
    from viditq_tpu.quant.spec import SmoothQuantSpec
    from viditq_tpu.quant.native_pack import add_native_slots

    W4 = QuantSpec(n_bits=4, granularity="channel", channel_axis=-1,
                   round_mode="nearest", mixed_precision=(4, 8))
    sq = SmoothQuantSpec(enable=True,
                         channel_wise_scale_type="momentum_act_max",
                         alpha=(0.11, 0.11),
                         timerange=((0, 500), (501, 1000)),
                         qkv_share_cs=True)
    spec = LayerQuantSpec(weight=W4, act=A8, smooth_quant=sq,
                          backend="native", impl="fused")
    res = lambda n: spec
    B, T, S, C = 1, 4, 64, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T * S, C)) * 0.5, jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, 8, C)) * 0.5, jnp.float32)
    t0 = jnp.asarray(rng.standard_normal((B, 6 * C)) * 0.1, jnp.float32)
    block = STDiTBlock(hidden_size=C, num_heads=4, d_s=S, d_t=T,
                       resolver=res, prefix="b", dtype=jnp.float32)
    monkeypatch.setenv("VIDITQ_FORCE_FUSED", "1")
    with pltpu.force_tpu_interpret_mode():
        vs = dict(block.init(jax.random.PRNGKey(0), x, y, t0,
                             qctx=QuantCtx(mode="fp")))
        for t_id in (100, 900):
            _, muts = block.apply(
                vs, x, y, t0,
                qctx=QuantCtx(mode="sq_stat",
                              t_id=jnp.asarray(t_id, jnp.int32)),
                mutable=["quant", "qstats"])
            vs["quant"] = muts["quant"]
            vs["qstats"] = muts["qstats"]
        vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"], res)
        vs["quant"] = add_native_slots(vs["quant"], vs["params"], res)
        vs["quant"] = pack_native_weights(vs["params"], vs["quant"], res)
        qc = QuantCtx(mode="quant", t_id=jnp.asarray(300))
        out_prod = block.apply(vs, x, y, t0, qctx=qc)
        monkeypatch.setenv("VIDITQ_FUSE_PRODUCER", "0")
        out_noprod = block.apply(vs, x, y, t0, qctx=qc)
        monkeypatch.delenv("VIDITQ_FUSE_PRODUCER")
    rel = float(jnp.linalg.norm(out_prod - out_noprod)
                / jnp.linalg.norm(out_noprod))
    assert rel < 5e-3, rel
