"""Analysis tooling tests: sensitivity, sweep-alpha, CB shortlist, PTQD,
timestep-wise mixed precision."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from viditq_tpu.models import STDiT
from viditq_tpu.pipelines import analysis
from viditq_tpu.pipelines.mixed_precision import mp_quant_sample
from viditq_tpu.samplers import IDDPM
from viditq_tpu.quant import (
    LayerQuantSpec, QuantSpec, QuantCtx, calibrate_weight_tables,
    resolve_layer_spec)
from viditq_tpu.utils.config import QuantPlanConfig
import pytest

pytestmark = pytest.mark.heavy

W8 = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
               round_mode="nearest")
W4 = QuantSpec(n_bits=4, granularity="channel", channel_axis=-1,
               round_mode="nearest", mixed_precision=(4, 8))
A8 = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
               dynamic=True)
FP = ("x_embedder", "t_block", "t_embedder", "y_embedder", "final_layer")


def tiny_model(resolver=None):
    return STDiT(input_size=(4, 8, 8), in_channels=4, patch_size=(1, 2, 2),
                 hidden_size=64, depth=2, num_heads=4, caption_channels=32,
                 model_max_length=8, dtype=jnp.float32,
                 resolver=resolver or (lambda n: None))


def inputs(B=1):
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((B, 4, 4, 8, 8)), jnp.float32)
    y_c = jnp.asarray(rng.standard_normal((B, 1, 8, 32)), jnp.float32)
    y = jnp.concatenate([y_c, y_c * 0], axis=0)
    mask = jnp.ones((B, 8), jnp.int32)
    return z, y, mask


def test_sensitivity_scan_groups():
    base = LayerQuantSpec(weight=QuantSpec(n_bits=3, granularity="channel",
                                           channel_axis=-1,
                                           round_mode="nearest"), act=A8)
    z, y, mask = inputs()
    sampler = IDDPM(num_sampling_steps=2, cfg_scale=4.0)
    ref_model = tiny_model()
    variables = ref_model.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)),
                               y[:1], mask, QuantCtx(mode="fp"))
    params = variables["params"]

    def run_with_resolver(resolver):
        model = tiny_model(resolver)
        vs = model.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)), y[:1],
                        mask, QuantCtx(mode="fp"))
        vs = dict(vs)
        vs["params"] = params  # same weights across configs
        if "quant" in vs:
            vs["quant"] = calibrate_weight_tables(params, vs["quant"],
                                                  resolver)
        def apply_fn(x, t, yy, mm, qctx):
            return model.apply(vs, x, t, yy, mm, qctx)
        from viditq_tpu.samplers.iddpm import default_qctx_factory
        return sampler.sample(apply_fn, z, y, mask, sampler_type="ddim",
                              qctx_factory=default_qctx_factory("quant"))

    scores = analysis.sensitivity_scan(
        run_with_resolver, base, targets=list(analysis.QUANT_GROUPS),
        fp_patterns=FP)
    assert set(scores) == set(analysis.QUANT_GROUPS)
    assert all(np.isfinite(v) and v > 0 for v in scores.values())


def test_sweep_alpha_and_candidates():
    sq = dataclasses.replace(LayerQuantSpec(weight=W8, act=A8).smooth_quant)
    base = LayerQuantSpec(weight=W8, act=A8)
    resolver = lambda n: resolve_layer_spec(n, base, FP)
    model = tiny_model(resolver)
    z, y, mask = inputs()
    variables = model.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)), y[:1],
                           mask, QuantCtx(mode="fp"))
    args = (z, jnp.zeros((1,)), y[:1], mask)
    best = analysis.sweep_alpha(model, variables, args,
                                resolver, alphas=np.arange(0.4, 0.8, 0.1))
    assert len(best) > 0
    assert all(0.39 < a < 0.81 for a in best.values())
    assert "blocks.0.attn.q" in best
    picks = analysis.smooth_quant_candidates(model, variables, args, resolver,
                                             act_ratio_threshold=1.0)
    assert isinstance(picks, list) and len(picks) > 0


def test_ptqd_k_calibration():
    rng = np.random.default_rng(0)
    fp = jnp.asarray(rng.standard_normal((3, 64)), jnp.float32)
    quant = 1.5 * fp + 0.01 * jnp.asarray(rng.standard_normal((3, 64)))
    k = analysis.calibrate_ptqd_k(fp, quant)
    np.testing.assert_allclose(k, 0.5, atol=0.05)
    corrected = analysis.apply_ptqd_correction(quant[0], k, 0)
    rel = np.linalg.norm(np.asarray(corrected - fp[0])) / np.linalg.norm(
        np.asarray(fp[0]))
    assert rel < 0.05


def test_mixed_precision_segmented_sampling():
    base = LayerQuantSpec(weight=W4, act=A8)
    plan = QuantPlanConfig(default_layer=base, fp_patterns=FP,
                           mixed_precision=(4, 8))
    z, y, mask = inputs()
    sampler = IDDPM(num_sampling_steps=4, cfg_scale=4.0)
    ref_model = tiny_model(plan.resolver())
    variables = ref_model.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)),
                               y[:1], mask, QuantCtx(mode="fp"))
    variables = dict(variables)
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], plan.resolver())

    mp_weight = {"3-2": {"model.blocks.0.attn.q": 4,
                         "model.blocks.1.mlp.fc1": 4},
                 "1-0": {"model.blocks.0.attn.q": 8},
                 "fp_layers": ["model.blocks.1.cross_attn.kv_linear"]}

    def model_ctor(resolver):
        return tiny_model(resolver)

    out = mp_quant_sample(model_ctor, variables, sampler, z, y, mask, plan,
                          mp_weight, None)
    assert out.shape == z.shape
    assert np.isfinite(np.asarray(out)).all()


def test_mixed_precision_native_repack_matches_simulate():
    """build_mp_sampler on a backend='native' plan repacks the int weight
    slabs per step range INSIDE the jit; the result must track the
    simulate-backend MP path (same codes, per-row act scales differ only
    at batch>1 — B=1 here, so the paths agree tightly)."""
    from viditq_tpu.pipelines.mixed_precision import build_mp_sampler

    base = LayerQuantSpec(weight=W4, act=A8)
    base_nat = dataclasses.replace(base, backend="native")
    plan = QuantPlanConfig(default_layer=base, fp_patterns=FP,
                           mixed_precision=(4, 8))
    plan_nat = QuantPlanConfig(default_layer=base_nat, fp_patterns=FP,
                               mixed_precision=(4, 8))
    z, y, mask = inputs()
    sampler = IDDPM(num_sampling_steps=4, cfg_scale=4.0)
    nat_model = tiny_model(plan_nat.resolver())
    variables = nat_model.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)),
                               y[:1], mask, QuantCtx(mode="fp"))
    variables = dict(variables)
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], plan_nat.resolver())

    mp_weight = {"3-2": {"model.blocks.0.attn.q": 8,
                         "model.blocks.1.mlp.fc1": 8},
                 "1-0": {"model.blocks.0.attn.q": 4},
                 "fp_layers": ["model.blocks.1.cross_attn.kv_linear"]}

    sim_fn = build_mp_sampler(tiny_model, sampler, plan, mp_weight, None)
    nat_fn = build_mp_sampler(tiny_model, sampler, plan_nat, mp_weight, None)
    assert plan_nat.uses_native() and not plan.uses_native()

    # the simulate path ignores the (zero) native slots; both runs share
    # the same params + w_delta/w_zp tables
    out_sim = sim_fn(variables, z, y, mask)
    out_nat = nat_fn(variables, z, y, mask)
    assert np.isfinite(np.asarray(out_nat)).all()
    rel = (np.linalg.norm(np.asarray(out_nat - out_sim))
           / max(np.linalg.norm(np.asarray(out_sim)), 1e-9))
    assert rel < 0.05, rel


def test_mixed_precision_gather_matches_segmented():
    """The single-scan gather MP path (per-range slabs + effective dequant
    tables gathered by tr_id) must reproduce the segmented per-range-scan
    design exactly: same codes, same kernels, one compiled program."""
    from viditq_tpu.pipelines.mixed_precision import (build_mp_sampler,
                                                      build_mp_sampler_gather)
    from viditq_tpu.quant.native_pack import pack_native_weights
    from viditq_tpu.quant.spec import SmoothQuantSpec

    sq = SmoothQuantSpec(enable=True,
                         channel_wise_scale_type="momentum_act_max",
                         alpha=(0.3, 0.5),
                         timerange=((0, 500), (501, 1000)))
    base = LayerQuantSpec(weight=W4, act=A8, smooth_quant=sq,
                          backend="native")
    plan = QuantPlanConfig(default_layer=base, fp_patterns=FP,
                           mixed_precision=(4, 8))
    res = plan.resolver()
    z, y, mask = inputs()
    sampler = IDDPM(num_sampling_steps=4, cfg_scale=4.0)
    model = tiny_model(res)
    variables = model.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)),
                           y[:1], mask, QuantCtx(mode="fp"))
    variables = dict(variables)
    # fill BOTH timeranges' smooth-quant act stats, then calibrate + pack
    # at the base allocation (the deploy-time input contract of both paths)
    for t_id in (100, 900):
        _, muts = model.apply(
            variables, z, jnp.full((1,), float(t_id)), y[:1], mask,
            QuantCtx(mode="sq_stat", t_id=jnp.asarray(t_id, jnp.int32)),
            mutable=["quant", "qstats"])
        variables["quant"] = muts["quant"]
        variables["qstats"] = muts["qstats"]
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], res)
    variables["quant"] = pack_native_weights(
        variables["params"], variables["quant"], res)

    mp_weight = {"3-2": {"model.blocks.0.attn.q": 8,
                         "model.blocks.1.mlp.fc1": 8},
                 "1-0": {"model.blocks.0.attn.q": 4},
                 "fp_layers": ["model.blocks.1.cross_attn.kv_linear"]}

    gat_fn = build_mp_sampler(tiny_model, sampler, plan, mp_weight, None)
    assert hasattr(gat_fn, "n_ranges"), \
        "native CB plan with uniform A8 must take the gather path"
    seg_fn = build_mp_sampler(tiny_model, sampler, plan, mp_weight, None,
                              force_segmented=True)
    out_gat = gat_fn(variables, z, y, mask)
    out_seg = seg_fn(variables, z, y, mask)
    assert np.isfinite(np.asarray(out_gat)).all()
    # not bit-exact: the two paths compile different programs, so fp
    # reduction orders differ and borderline dynamic-act codes flip
    # (single-forward rel is 1e-7..5e-5; the DDIM trajectory amplifies
    # those flips). Packed slabs + effective scales are IDENTICAL
    # (verified elementwise during bring-up).
    rel = (np.linalg.norm(np.asarray(out_gat - out_seg))
           / max(np.linalg.norm(np.asarray(out_seg)), 1e-9))
    assert rel < 1e-2, rel
    # prepared variables short-circuit the adapter and agree
    prep = gat_fn.prepare(variables, z, y, mask)
    out_prep = gat_fn(prep, z, y, mask)
    np.testing.assert_allclose(np.asarray(out_prep), np.asarray(out_gat),
                               rtol=0, atol=0)

    # module-PREFIX config names ('blocks.0.attn' covering qkv/proj leaves,
    # the reference's group-level glob semantics) must hit the gather path
    # the same way they pattern-match on the segmented path — round 4 the
    # gather builder looked bits up by exact leaf name and silently applied
    # NOTHING for prefix entries
    mp_prefix = {"3-2": {"model.blocks.0.attn": 8},
                 "1-0": {"model.blocks.0.attn": 4}}
    gat_p = build_mp_sampler(tiny_model, sampler, plan, mp_prefix, None)
    assert hasattr(gat_p, "n_ranges")
    seg_p = build_mp_sampler(tiny_model, sampler, plan, mp_prefix, None,
                             force_segmented=True)
    out_gp = gat_p(variables, z, y, mask)
    out_sp = seg_p(variables, z, y, mask)
    rel_p = (np.linalg.norm(np.asarray(out_gp - out_sp))
             / max(np.linalg.norm(np.asarray(out_sp)), 1e-9))
    assert rel_p < 1e-2, rel_p
    # and the prefix entry actually changed the allocation vs all-default
    rel_d = (np.linalg.norm(np.asarray(out_gp - out_gat))
             / max(np.linalg.norm(np.asarray(out_gat)), 1e-9))
    assert rel_d > 1e-6, "prefix MP entries were silently dropped"


def test_timestep_window_sensitivity():
    base = LayerQuantSpec(weight=QuantSpec(n_bits=3, granularity="channel",
                                           channel_axis=-1,
                                           round_mode="nearest"), act=A8)
    resolver = lambda n: resolve_layer_spec(n, base, FP)
    from viditq_tpu.quant import resolve_layer_spec as _r  # noqa
    model = tiny_model(resolver)
    z, y, mask = inputs()
    sampler = IDDPM(num_sampling_steps=4, cfg_scale=4.0)
    variables = dict(model.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)),
                                y[:1], mask, QuantCtx(mode="fp")))
    variables["quant"] = calibrate_weight_tables(
        variables["params"], variables["quant"], resolver)

    def fp_apply(x, t, yy, mm, qctx=None):
        return model.apply(variables, x, t, yy, mm, QuantCtx(mode="fp"))

    def q_apply(x, t, yy, mm, qctx=None):
        return model.apply(variables, x, t, yy, mm, qctx)

    from viditq_tpu.samplers.iddpm import default_qctx_factory
    scores = analysis.timestep_window_sensitivity(
        sampler, fp_apply, q_apply, z, y, mask,
        windows=[(3, 2), (1, 0)],
        qctx_factory=default_qctx_factory("quant"))
    assert set(scores) == {"3-2", "1-0"}
    assert all(v > 0 and np.isfinite(v) for v in scores.values())


def test_generate_mp_config():
    sens = {"3-2": {"blocks.0.attn.q": 5.0, "blocks.0.mlp.fc1": 1.0,
                    "blocks.1.attn.q": 0.5, "blocks.1.mlp.fc1": 0.2},
            "1-0": {"blocks.0.attn.q": 0.1, "blocks.0.mlp.fc1": 2.0,
                    "blocks.1.attn.q": 0.3, "blocks.1.mlp.fc1": 0.2}}
    cfg = analysis.generate_mp_config(sens, high_fraction=0.25)
    assert cfg["3-2"]["blocks.0.attn.q"] == 8       # most sensitive -> high
    assert cfg["3-2"]["blocks.1.mlp.fc1"] == 4
    assert cfg["1-0"]["blocks.0.mlp.fc1"] == 8
    assert cfg["fp_layers"] == []
    # pipes straight into the MP inference parser
    ranges = analysis.parse_mp_ranges(cfg)
    assert [r[0] for r in ranges] == [(3, 2), (1, 0)]


def test_partial_and_until_resolvers():
    base = LayerQuantSpec(weight=W8, act=A8)
    names = [f"blocks.{i}.attn.q" for i in range(10)] + ["final_layer.linear"]
    r = analysis.partial_quant_resolver(base, names, quant_ratio=0.5,
                                        fp_patterns=("final_layer",))
    on = [n for n in names if r(n).weight_quant]
    assert len(on) == 5
    assert "final_layer.linear" not in on
    r2 = analysis.quantize_until_resolver(base, names, k=3)
    on2 = [n for n in names if r2(n).weight_quant]
    assert on2 == names[:3]


def test_uniform_windows_matches_reference_split():
    # get_sensitivity.py:480,727-731 with n=20, split=4
    assert analysis.uniform_windows(20, 4) == [(19, 15), (14, 10),
                                               (9, 5), (4, 0)]
    assert analysis.uniform_windows(4, 2) == [(3, 2), (1, 0)]


def test_block_group_sensitivity_and_mp_closed_loop():
    """block x group x window scan (reference block_group_wise_quant) ->
    reshape -> generate_mp_config -> mp_quant_sample: the closed loop the
    reference only runs offline through metric.ipynb."""
    base = LayerQuantSpec(weight=QuantSpec(n_bits=3, granularity="channel",
                                           channel_axis=-1,
                                           round_mode="nearest"), act=A8)
    z, y, mask = inputs()
    sampler = IDDPM(num_sampling_steps=4, cfg_scale=4.0)
    ref_model = tiny_model()
    variables = ref_model.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)),
                               y[:1], mask, QuantCtx(mode="fp"))
    params = variables["params"]

    def fp_apply(x, t, yy, mm, qctx=None):
        return ref_model.apply({"params": params}, x, t, yy, mm)

    def make_q_apply(resolver):
        model = tiny_model(resolver)
        vs = dict(model.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)),
                             y[:1], mask, QuantCtx(mode="fp")))
        vs["params"] = params
        if "quant" in vs:
            vs["quant"] = calibrate_weight_tables(params, vs["quant"],
                                                  resolver)

        def q_apply(x, t, yy, mm, qctx):
            return model.apply(vs, x, t, yy, mm, qctx)
        return q_apply

    from viditq_tpu.samplers.iddpm import default_qctx_factory
    qf = default_qctx_factory("quant")
    scores = analysis.block_group_sensitivity(
        sampler, fp_apply, make_q_apply, z, y, mask, base, n_blocks=2,
        qctx_factory=qf, groups=("attn", "mlp"), bits=(3,),
        split_timestep=2, fp_patterns=FP)
    # 1 bit x 2 windows x 2 blocks x 2 groups
    assert len(scores) == 8
    assert set(scores) == {
        f"bit3/{w}/blocks.{j}.{g}"
        for w in ("3-2", "1-0") for j in (0, 1) for g in ("attn", "mlp")}
    assert all(np.isfinite(v) and v > 0 for v in scores.values())

    # ---- closed loop: scores -> MP config -> load -> sample ----
    by_range = analysis.block_group_to_range_scores(scores, bit=3)
    assert set(by_range) == {"3-2", "1-0"}
    assert len(by_range["3-2"]) == 4
    mp_cfg = analysis.generate_mp_config(by_range, bits_low=4, bits_high=8,
                                         high_fraction=0.25)
    # every block.group got a bit in every range
    assert all(set(mp_cfg[r]) == set(by_range[r]) for r in by_range)

    plan = QuantPlanConfig(default_layer=LayerQuantSpec(weight=W4, act=A8),
                           fp_patterns=FP, mixed_precision=(4, 8))
    mp_model = tiny_model(plan.resolver())
    mp_vars = dict(mp_model.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)),
                                 y[:1], mask, QuantCtx(mode="fp")))
    mp_vars["params"] = params
    mp_vars["quant"] = calibrate_weight_tables(params, mp_vars["quant"],
                                               plan.resolver())

    def model_ctor(resolver):
        return tiny_model(resolver)

    out = mp_quant_sample(model_ctor, mp_vars, sampler, z, y, mask, plan,
                          mp_weight_cfg=mp_cfg, mp_act_cfg=None)
    assert out.shape == z.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_multi_metric_scan_and_combine():
    """flow/clip_temp proxies + combine_sensitivity close the reference's
    metric-decoupled MP loop (clip/flow/vqa vectors -> metric.ipynb
    combination -> MP config)."""
    from viditq_tpu.utils.metrics import make_sensitivity_metric

    base = LayerQuantSpec(weight=QuantSpec(n_bits=3, granularity="channel",
                                           channel_axis=-1,
                                           round_mode="nearest"), act=A8)
    z, y, mask = inputs()
    sampler = IDDPM(num_sampling_steps=2, cfg_scale=4.0)
    ref_model = tiny_model()
    variables = ref_model.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)),
                               y[:1], mask, QuantCtx(mode="fp"))
    params = variables["params"]

    def run_with_resolver(resolver):
        model = tiny_model(resolver)
        vs = dict(model.init(jax.random.PRNGKey(0), z, jnp.zeros((1,)),
                             y[:1], mask, QuantCtx(mode="fp")))
        vs["params"] = params
        if "quant" in vs:
            vs["quant"] = calibrate_weight_tables(params, vs["quant"],
                                                  resolver)

        def apply_fn(x, t, yy, mm, qctx):
            return model.apply(vs, x, t, yy, mm, qctx)
        from viditq_tpu.samplers.iddpm import default_qctx_factory
        return sampler.sample(apply_fn, z, y, mask, sampler_type="ddim",
                              qctx_factory=default_qctx_factory("quant"))

    metric_fns = {m: make_sensitivity_metric(m)
                  for m in ("mse", "flow", "clip_temp")}
    vectors = analysis.sensitivity_scan_multi(
        run_with_resolver, base, targets=list(analysis.QUANT_GROUPS),
        metric_fns=metric_fns, fp_patterns=FP)
    assert set(vectors) == {"mse", "flow", "clip_temp"}
    for vec in vectors.values():
        assert set(vec) == set(analysis.QUANT_GROUPS)
        assert all(np.isfinite(v) for v in vec.values())
    # mse scores must match the single-metric scan (same generations)
    solo = analysis.sensitivity_scan(
        run_with_resolver, base, targets=list(analysis.QUANT_GROUPS),
        fp_patterns=FP)
    for k in solo:
        np.testing.assert_allclose(vectors["mse"][k], solo[k], rtol=1e-5)

    combined = analysis.combine_sensitivity(vectors)
    assert set(combined) == set(analysis.QUANT_GROUPS)
    assert all(0.0 <= v <= 1.0 for v in combined.values())
    # rank-combination sanity: a layer that every metric ranks highest
    # must top the combined ranking
    tops = {max(vec, key=vec.get) for vec in vectors.values()}
    if len(tops) == 1:
        assert max(combined, key=combined.get) == tops.pop()
    # the combined vector feeds generate_mp_config unchanged
    cfg = analysis.generate_mp_config({"1-0": combined}, high_fraction=0.5)
    assert "1-0" in cfg and set(cfg["1-0"]) == set(analysis.QUANT_GROUPS)

    # weights: zeroing all but one metric reproduces that metric's ranking
    only_flow = analysis.combine_sensitivity(
        vectors, weights={"flow": 1.0, "mse": 0.0, "clip_temp": 0.0})
    flow_rank = sorted(vectors["flow"], key=vectors["flow"].get)
    comb_rank = sorted(only_flow, key=only_flow.get)
    assert flow_rank == comb_rank
