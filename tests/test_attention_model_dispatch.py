"""Model-level dispatch of the int8 attention kernels (CPU, interpret mode).

VIDITQ_FORCE_ATTN_KERNEL=1 + pltpu.force_tpu_interpret_mode drive the
SelfAttention/CrossAttention Pallas branches that normally only run on TPU,
including the int8 softmax-PV execution and the int8-emitting proj path —
asserting they stay within 8-bit tolerance of the fake-quant XLA fallback.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from viditq_tpu.quant import LayerQuantSpec, QuantSpec, QuantCtx
from viditq_tpu.quant.spec import QuantSpec as QS

pytestmark = pytest.mark.heavy

W8S = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
                round_mode="nearest", sym=True)
A8S = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
                dynamic=True, sym=True)
SM8 = QuantSpec(n_bits=8, granularity="tensor", always_zero=True,
                dynamic=True)


def _mk_resolver(spec):
    return lambda name: spec


def _build(module, x_args, resolver_spec, quant_pack=True):
    from viditq_tpu.quant import calibrate_weight_tables
    from viditq_tpu.quant.native_pack import add_native_slots, \
        pack_native_weights
    resolver = _mk_resolver(resolver_spec)
    vs = module.init(jax.random.PRNGKey(0), *x_args,
                     QuantCtx(mode="fp"))
    vs = dict(vs)
    if quant_pack and "quant" in vs:
        vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"],
                                              resolver)
        vs["quant"] = add_native_slots(vs["quant"], vs["params"], resolver)
        vs["quant"] = pack_native_weights(vs["params"], vs["quant"],
                                          resolver)
    return vs


A8A = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
                dynamic=True, sym=False)
W8A = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
                round_mode="nearest", sym=False)


@pytest.mark.parametrize("with_sm8,wspec,aspec", [
    (False, "W8S", "A8S"), (True, "W8S", "A8S"),
    (False, "W8A", "A8A"),
    # asym acts on SYM weights: the emission path passes zp without
    # rowsum — regression case for the consumer operand crash (round-2f)
    (False, "W8S", "A8A"),
])
def test_self_attention_kernel_dispatch_matches_fallback(with_sm8, wspec,
                                                         aspec):
    from viditq_tpu.models.layers import SelfAttention
    W = {"W8S": W8S, "W8A": W8A}[wspec]
    A = {"A8S": A8S, "A8A": A8A}[aspec]
    base = LayerQuantSpec(weight=W, act=A, backend="native", impl="fused")
    spec = dataclasses.replace(base, softmax=SM8) if with_sm8 else base
    C, H = 64, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 128, C)), jnp.float32)
    attn = SelfAttention(C, H, resolver=_mk_resolver(spec), prefix="a",
                         dtype=jnp.float32, name="attn")
    vs = _build(attn, (x,), spec)
    qctx = QuantCtx(mode="quant")
    # fallback path (no TPU force): fake-quant XLA
    want = attn.apply(vs, x, qctx)
    # forced kernel dispatch in interpret mode
    os.environ["VIDITQ_FORCE_ATTN_KERNEL"] = "1"
    os.environ["VIDITQ_FORCE_FUSED"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            got = attn.apply(vs, x, qctx)
    finally:
        del os.environ["VIDITQ_FORCE_ATTN_KERNEL"]
        del os.environ["VIDITQ_FORCE_FUSED"]
    err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert err < 0.05, err  # int8-exec vs fake-quant, both 8-bit paths


@pytest.mark.parametrize("share_cs", [False, True])
def test_self_attention_cb_emit_fold_matches_fallback(share_cs):
    """CB (smooth-quant) plans keep the int8-emitting attention: the proj's
    per-timerange 1/cs folds into the kernel's output quantize
    (attention_bnhd_int8out col_scale) and matches the XLA fallback, which
    applies the rescale as a standalone pass."""
    from viditq_tpu.models.layers import SelfAttention
    from viditq_tpu.quant import calibrate_weight_tables
    from viditq_tpu.quant.spec import SmoothQuantSpec
    from viditq_tpu.quant.native_pack import add_native_slots, \
        pack_native_weights
    smooth = SmoothQuantSpec(
        enable=True, channel_wise_scale_type="momentum_act_max",
        alpha=(0.5, 0.6), timerange=((0, 500), (501, 1000)),
        qkv_share_cs=share_cs)
    spec = LayerQuantSpec(weight=W8S, act=A8S, backend="native",
                          impl="fused", smooth_quant=smooth)
    C, H = 64, 2
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 128, C)), jnp.float32)
    attn = SelfAttention(C, H, resolver=_mk_resolver(spec), prefix="a",
                         dtype=jnp.float32, name="attn")
    res = _mk_resolver(spec)
    vs = dict(attn.init(jax.random.PRNGKey(0), x, QuantCtx(mode="fp")))
    for t_id in (100, 900):
        _, muts = attn.apply(
            vs, x, QuantCtx(mode="sq_stat", t_id=jnp.asarray(t_id)),
            mutable=["quant", "qstats"])
        vs["quant"] = muts["quant"]
        if "qstats" in muts:
            vs["qstats"] = muts["qstats"]
    vs["quant"] = calibrate_weight_tables(vs["params"], vs["quant"], res)
    vs["quant"] = add_native_slots(vs["quant"], vs["params"], res)
    vs["quant"] = pack_native_weights(vs["params"], vs["quant"], res)
    for t in (300, 800):  # one per timerange: the 1/cs gather is per-tr
        qctx = QuantCtx(mode="quant", t_id=jnp.asarray(t))
        want = attn.apply(vs, x, qctx)
        os.environ["VIDITQ_FORCE_ATTN_KERNEL"] = "1"
        os.environ["VIDITQ_FORCE_FUSED"] = "1"
        try:
            with pltpu.force_tpu_interpret_mode():
                got = attn.apply(vs, x, qctx)
        finally:
            del os.environ["VIDITQ_FORCE_ATTN_KERNEL"]
            del os.environ["VIDITQ_FORCE_FUSED"]
        err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        assert err < 0.05, (t, err)


def test_cross_attention_kernel_dispatch_matches_fallback():
    from viditq_tpu.models.layers import CrossAttention
    spec = LayerQuantSpec(weight=W8S, act=A8S, backend="native",
                          impl="fused", softmax=SM8)
    C, H, P = 64, 2, 24
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 128, C)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, P, C)), jnp.float32)
    mask = jnp.ones((1, P), jnp.int32)
    attn = CrossAttention(C, H, resolver=_mk_resolver(spec), prefix="c",
                          dtype=jnp.float32, name="cross")
    vs = _build(attn, (x, y, mask), spec)
    qctx = QuantCtx(mode="quant")
    want = attn.apply(vs, x, y, mask, qctx)
    os.environ["VIDITQ_FORCE_ATTN_KERNEL"] = "1"
    os.environ["VIDITQ_FORCE_FUSED"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            got = attn.apply(vs, x, y, mask, qctx)
    finally:
        del os.environ["VIDITQ_FORCE_ATTN_KERNEL"]
        del os.environ["VIDITQ_FORCE_FUSED"]
    err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert err < 0.05, err
