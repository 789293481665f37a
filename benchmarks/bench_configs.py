"""TPU measurements for the remaining BASELINE.md configs (round-2 VERDICT
next #3). One arm per invocation; each prints ONE JSON line with same-run
bf16 baseline, quant ms/step (or ms/forward), speedup, and rel err.

Arms:
  w4a8      STDiT-XL/2 16x512x512 e2e ddim-20 CFG, W4A8 fused-native
            (first on-chip exercise of 4-bit weight codes through the int8
            MXU dataflow; plus the pack4 weight-only memory figure)
  t20mp     STDiT-XL/2 e2e with the t20 timestep-MP plan
            (configs/opensora/mixed_precision/t20_*.yaml) — measures the
            segmented-scan machinery (5 ranges x separate jitted scans)
            against the same-run single-plan arm
  sigma1024 PixArt-Sigma XL-2 1024x1024 (latent 128) with conv KV
            compression sr=2 on blocks 14-27, single CFG forward B=2,
            bf16 vs W4A8 fused
  latte     Latte-XL/2 16x256x256, W4A8 timestep-MP e2e ddim-20 vs bf16

Usage: python benchmarks/bench_configs.py [w4a8|t20mp|sigma1024|latte ...]
"""

import json
import os
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np

# VIDITQ_BENCH_TINY=1: shrink shapes/steps AND the model (2 blocks, small
# hidden) so the arm LOGIC smoke-runs on CPU in minutes (numbers
# meaningless) — used before spending TPU time on compiles.
TINY = os.environ.get("VIDITQ_BENCH_TINY") == "1"
# model-shrink kwargs applied on top of the XL presets in TINY mode
TINY_NET = dict(depth=2, hidden_size=64, num_heads=4) if TINY else {}


def _timer(n_warm=1, reps=3):
    def bench(f, *args):
        f(*args).block_until_ready()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f(*args).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return bench


def _maybe_profile(tag, fn, *args):
    """VIDITQ_PROFILE=1: trace ONE steady-state call of `fn` and print the
    top device ops (utils/xplane parser) — attributes where a weak arm's
    time goes without a separate harness per model."""
    if os.environ.get("VIDITQ_PROFILE") != "1":
        return
    import tempfile
    import jax
    logdir = tempfile.mkdtemp(prefix=f"viditq_prof_{tag}_")
    with jax.profiler.trace(logdir):
        fn(*args).block_until_ready()
    from viditq_tpu.utils.xplane import top_ops
    rows = top_ops(logdir, n=int(os.environ.get("VIDITQ_PROFILE_N", "30")))
    total = sum(r["ms"] for r in rows)
    print(json.dumps({"profile": tag, "top_total_ms": round(total, 2)}))
    for r in rows:
        print(json.dumps({"op": r["op"][:110], "ms": round(r["ms"], 3),
                          "count": r["count"]}), flush=True)


def _build_variables(model, resolver, init_args, jax, jnp):
    """Random-param init + weight-table calibration + native packing, all
    jitted (constant-folding the calibration is pathologically slow)."""
    from viditq_tpu.quant import QuantCtx, calibrate_weight_tables
    from viditq_tpu.quant.native_pack import pack_native_weights

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *init_args,
                           qctx=QuantCtx(mode="fp")))

    @jax.jit
    def build(key):
        leaves, treedef = jax.tree.flatten(dict(shapes))
        keys = jax.random.split(key, len(leaves))
        vals = [(jax.random.normal(k, s.shape, s.dtype) * 0.02
                 if jnp.issubdtype(s.dtype, jnp.floating)
                 else jnp.zeros(s.shape, s.dtype))
                for k, s in zip(keys, leaves)]
        variables = jax.tree.unflatten(treedef, vals)
        if resolver is not None and "quant" in variables:
            q = calibrate_weight_tables(variables["params"],
                                        variables["quant"], resolver)
            q = pack_native_weights(variables["params"], q, resolver)
            out = {"params": variables["params"], "quant": q}
            if "qstats" in variables:
                # CB plans create sq_init/a_* running-stat slots; the
                # quant forward needs the collection present (zeros =
                # uncalibrated, fine for timing arms)
                out["qstats"] = jax.tree.map(jnp.zeros_like,
                                             variables["qstats"])
            variables = out
        else:
            variables = {"params": variables["params"]}
        return variables

    out = build(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    return out


def arm_w4a8():
    """The FULL ViDiT-Q W4A8 recipe, executed natively: timerange
    channel-balancing (w4a8_timestep_aware_cb.yaml) + the t20 timestep-
    aware MP allocation, one compiled scan via the gather MP sampler.
    This is the configuration behind the reference's 'W4A8 without notable
    visual quality degradation' claim (README.md:21 + README.md:148-152) —
    NOT the naive all-layer-W4 plan round 3 measured at rel 0.077
    (tpu_pending_results.txt, arm w4a8_native_stdit_xl2_16x512x512).

    VIDITQ_W4A8_SCALE=grid_search_lp switches the weight-scale init to the
    reference's Lp grid search (base_quantizer.py:230-249) — a quality
    knob with zero runtime cost (packed offline).

    VIDITQ_W4A8_FLOOR=1: weights-only variant (act quant off) — measures
    the W4 weight-quantization INFORMATION FLOOR of this recipe on these
    (synthetic gaussian) weights; the full arm's rel err should sit within
    a few percent of it. AdaRound was measured a no-op on gaussian weights
    (1.05x layer MSE at 2000 iters — it needs correlated real activations),
    so on synthetic weights the floor is not recoverable; see BENCH_NOTES.

    VIDITQ_W4A8_MIDBITS=6: TPU-native alternative allocation — the t20
    plan's W4 mid-range layers run W6 instead. On this backend W6 codes
    live in the same int8 slabs as W4, so THROUGHPUT IS IDENTICAL; the
    trade is weight memory (2x vs 4x reduction) for quality. The
    reference's 4-vs-8 tradeoff (README quality claims) lands differently
    on TPU hardware."""
    import yaml
    import dataclasses
    import jax
    import jax.numpy as jnp
    from viditq_tpu.models import STDiT_XL_2
    from viditq_tpu.pipelines.mixed_precision import build_mp_sampler
    from viditq_tpu.quant import QuantCtx, calibrate_weight_tables
    from viditq_tpu.samplers import IDDPM
    from viditq_tpu.utils.config import load_quant_config

    latent = (4, 8, 8) if TINY else (16, 64, 64)
    n_steps = 2 if TINY else 20
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 4, *latent)) * 0.5, jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((2, 1, 120, 4096)) * 0.1,
                    jnp.bfloat16)
    mask = jnp.ones((1, 120), jnp.int32)

    plan = load_quant_config(
        "configs/opensora/w4a8_timestep_aware_cb.yaml").with_backend("fused")
    scale_method = os.environ.get("VIDITQ_W4A8_SCALE")
    if scale_method:
        d = plan.default_layer
        plan = dataclasses.replace(plan, default_layer=dataclasses.replace(
            d, weight=dataclasses.replace(d.weight,
                                          scale_method=scale_method)))
    cb_share = os.environ.get("VIDITQ_CB_SHARE", "1") == "1"  # pooled-qkv CB: 1.071->1.16x, rel err unchanged (queue-6)
    if cb_share:
        d = plan.default_layer
        plan = dataclasses.replace(plan, default_layer=dataclasses.replace(
            d, smooth_quant=dataclasses.replace(d.smooth_quant,
                                                qkv_share_cs=True)))
    floor = os.environ.get("VIDITQ_W4A8_FLOOR") == "1"
    if floor:
        d = plan.default_layer
        plan = dataclasses.replace(
            plan, default_layer=dataclasses.replace(d, act_quant=False))
    midbits = int(os.environ.get("VIDITQ_W4A8_MIDBITS", "4"))
    allsym = os.environ.get("VIDITQ_ALLSYM") == "1"
    if allsym:
        # TPU-native allocation variant: sym acts x sym weights drop every
        # zero-point correction AND unlock the fc1 int8-emission epilogue
        # (sym-only); quality trade measured small at XL (sym 0.0572 vs
        # asym 0.0583 in-run, bench round-5)
        d = plan.default_layer
        plan = dataclasses.replace(plan, default_layer=dataclasses.replace(
            d, weight=dataclasses.replace(d.weight, sym=True),
            act=dataclasses.replace(d.act, sym=True)))
    res = plan.resolver()

    from viditq_tpu.models.stdit import STDiT

    def model_ctor(r):
        kw = {} if r is None else {"resolver": r}
        if TINY:
            return STDiT(input_size=latent, patch_size=(1, 2, 2),
                         scan_blocks=True, **TINY_NET, **kw)
        return STDiT_XL_2(input_size=latent, scan_blocks=True, **kw)

    model_fp = model_ctor(None)
    model_q = model_ctor(res)
    init_args = (jnp.concatenate([z, z]), jnp.zeros((2,)), y, mask)
    variables = _build_variables(model_q, res, init_args, jax, jnp)
    fp_vars = {"params": variables["params"]}

    # smooth-quant act stats: one sq_stat forward per CB timerange, then
    # re-derive the weight tables against them (the PTQ driver's phase
    # order, pipelines/ptq.py)
    smooth = plan.default_layer.smooth_quant
    t_probes = [int((lo + hi) // 2) for lo, hi in smooth.timerange]

    @jax.jit
    def sq_stat(vs):
        q = vs["quant"]
        for t_probe in t_probes:
            _, muts = model_q.apply(
                {**vs, "quant": q}, *init_args,
                qctx=QuantCtx(mode="sq_stat",
                              t_id=jnp.asarray(t_probe, jnp.int32)),
                mutable=["quant", "qstats"])
            q = muts["quant"]
        q = calibrate_weight_tables(vs["params"], q, res)
        return {"params": vs["params"], "quant": q,
                "qstats": muts["qstats"]}
    variables = sq_stat(variables)
    jax.block_until_ready(variables)

    with open("configs/opensora/mixed_precision/t20_weight_4_mp.yaml") as f:
        mp_w = yaml.safe_load(f)
    with open("configs/opensora/mixed_precision/t20_act_8_mp.yaml") as f:
        mp_a = yaml.safe_load(f)
    if midbits != 4:  # TPU-native allocation: W<midbits> mid ranges
        mp_w = {k: (v if k == "fp_layers"
                    else {n: (midbits if b == 4 else b)
                          for n, b in v.items()})
                for k, v in mp_w.items()}
    if TINY:  # retile the 20-step ranges onto the 2-step smoke sampler
        vals = [v for k, v in mp_w.items() if k != "fp_layers"]
        mp_w = {"1-1": vals[0], "0-0": vals[1], "fp_layers": []}
        mp_a = None

    sampler = IDDPM(num_sampling_steps=n_steps, cfg_scale=4.0)

    @jax.jit
    def fp_denoise(vs, z):
        return sampler.sample(lambda x, t, yy, mm, qctx:
                              model_fp.apply(vs, x, t, yy, mm),
                              z, y, mask, sampler_type="ddim")

    mp_fn = build_mp_sampler(model_ctor, sampler, plan, mp_w, mp_a)
    mp_vars = (mp_fn.prepare(variables, z, y, mask)
               if hasattr(mp_fn, "prepare") else variables)
    jax.block_until_ready(mp_vars)

    def q_denoise(z):
        return mp_fn(mp_vars, z, y, mask)

    bench = _timer()
    t_fp = bench(fp_denoise, fp_vars, z) / n_steps
    t_q = bench(q_denoise, z) / n_steps
    out_fp = fp_denoise(fp_vars, z)
    out_q = q_denoise(z)
    rel = float(jnp.linalg.norm((out_q - out_fp).astype(jnp.float32))
                / jnp.linalg.norm(out_fp.astype(jnp.float32)))
    print(json.dumps({
        "arm": "w4a8_viditq_full_stdit_xl2_16x512x512",
        "recipe": "timerange CB + t20 timestep-MP, single-scan native",
        "scale_method": scale_method or "min_max",
        "qkv_share_cs": cb_share,
        "weights_only_floor": floor,
        "mid_range_bits": midbits,
        "allsym": allsym,
        "single_scan": hasattr(mp_fn, "n_ranges"),
        "bf16_ms_per_step": round(t_fp * 1e3, 2),
        "w4a8_ms_per_step": round(t_q * 1e3, 2),
        "speedup": round(t_fp / t_q, 3),
        "rel_err_vs_bf16": round(rel, 4),
        "weight_mem_reduction_x": 4,
    }))


def arm_t20mp():
    import yaml
    import jax
    import jax.numpy as jnp
    from viditq_tpu.models import STDiT_XL_2
    from viditq_tpu.pipelines.mixed_precision import build_mp_sampler
    from viditq_tpu.samplers import IDDPM
    from viditq_tpu.utils.config import load_quant_config

    latent = (4, 8, 8) if TINY else (16, 64, 64)
    n_steps = 20  # the t20 plan tiles exactly 20 steps
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 4, *latent)) * 0.5, jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((2, 1, 120, 4096)) * 0.1,
                    jnp.bfloat16)
    mask = jnp.ones((1, 120), jnp.int32)

    # the t20 MP plan executed on the native int8 dataflow (fused Pallas
    # producer/consumer kernels); build_mp_sampler repacks the int slabs
    # per range at that range's bit allocation inside the jit
    import dataclasses
    plan = load_quant_config(
        "configs/opensora/w4a8_timestep_aware_cb.yaml").with_backend("fused")
    if os.environ.get("VIDITQ_CB_SHARE", "1") == "1":  # default on: queue-6 A/B
        d = plan.default_layer
        plan = dataclasses.replace(plan, default_layer=dataclasses.replace(
            d, smooth_quant=dataclasses.replace(d.smooth_quant,
                                                qkv_share_cs=True)))
    res = plan.resolver()

    from viditq_tpu.models.stdit import STDiT

    def model_ctor(r):
        kw = {} if r is None else {"resolver": r}
        if TINY:
            return STDiT(input_size=latent, patch_size=(1, 2, 2),
                         scan_blocks=True, **TINY_NET, **kw)
        return STDiT_XL_2(input_size=latent, scan_blocks=True, **kw)

    model = model_ctor(res)
    init_args = (jnp.concatenate([z, z]), jnp.zeros((2,)), y, mask)
    variables = _build_variables(model, res, init_args, jax, jnp)

    with open("configs/opensora/mixed_precision/t20_weight_4_mp.yaml") as f:
        mp_w = yaml.safe_load(f)
    with open("configs/opensora/mixed_precision/t20_act_8_mp.yaml") as f:
        mp_a = yaml.safe_load(f)

    sampler = IDDPM(num_sampling_steps=n_steps, cfg_scale=4.0)
    model_fp = model_ctor(None)
    fp_vars = {"params": variables["params"]}

    @jax.jit
    def fp_denoise(vs, z):
        return sampler.sample(lambda x, t, yy, mm, qctx:
                              model_fp.apply(vs, x, t, yy, mm),
                              z, y, mask, sampler_type="ddim")

    mp_fn = build_mp_sampler(model_ctor, sampler, plan, mp_w, mp_a)
    # gather path: adapt/pack the per-range slabs OFFLINE (the deploy-time
    # PTQ artifact), time only the serving sampler
    mp_vars = (mp_fn.prepare(variables, z, y, mask)
               if hasattr(mp_fn, "prepare") else variables)
    jax.block_until_ready(mp_vars)

    def mp_run(z):
        return mp_fn(mp_vars, z, y, mask)

    bench = _timer()
    t_fp = bench(fp_denoise, fp_vars, z) / n_steps
    t_mp = bench(mp_run, z) / n_steps
    print(json.dumps({
        "arm": "t20_timestep_mp_stdit_xl2_16x512x512",
        "single_scan": hasattr(mp_fn, "n_ranges"),
        "bf16_ms_per_step": round(t_fp * 1e3, 2),
        "t20mp_ms_per_step": round(t_mp * 1e3, 2),
        "speedup": round(t_fp / t_mp, 3),
        "n_ranges": len([k for k in mp_w if k != "fp_layers"]),
    }))
    _maybe_profile("t20mp_bf16", fp_denoise, fp_vars, z)
    _maybe_profile("t20mp_mp", mp_run, z)


def arm_sigma1024():
    import jax
    import jax.numpy as jnp
    from viditq_tpu.models import PixArtMS_XL_2
    from viditq_tpu.quant import QuantCtx
    from viditq_tpu.utils.config import load_quant_config

    # the BASELINE config: the reference sigma W4A8 plan (W6 weights +
    # A8 dynamic + momentum smooth-quant CB), executed on the native
    # int8 dataflow
    # 'fused' = native int dataflow + the Pallas producer/consumer kernels.
    # The first on-chip run used with_backend("native") (impl=None -> the
    # unfused XLA int8 path) and measured 0.914x — slower than bf16; the
    # dequant/correction passes never fused (BENCH_NOTES round-3g).
    import dataclasses
    plan = load_quant_config(
        "configs/pixart_sigma/w4a8.yaml").with_backend("fused")
    if os.environ.get("VIDITQ_CB_SHARE", "1") == "1":  # default on: queue-6 A/B
        d = plan.default_layer
        plan = dataclasses.replace(plan, default_layer=dataclasses.replace(
            d, smooth_quant=dataclasses.replace(d.smooth_quant,
                                                qkv_share_cs=True)))
    if os.environ.get("VIDITQ_ALLSYM") == "1":
        # see arm_w4a8: sym x sym variant (emission + zp-free epilogues)
        d = plan.default_layer
        plan = dataclasses.replace(plan, default_layer=dataclasses.replace(
            d, weight=dataclasses.replace(d.weight, sym=True),
            act=dataclasses.replace(d.act, sym=True)))
    res = plan.resolver()
    size = 16 if TINY else 128
    kw = dict(input_size=size, caption_channels=4096, model_max_length=300,
              kv_compress_sampling="conv", kv_compress_scale=2,
              kv_compress_layers=tuple(range(14, 28)), scan_blocks=True)
    model_fp = PixArtMS_XL_2(**kw)
    model_q = PixArtMS_XL_2(resolver=res, **kw)

    rng = np.random.default_rng(0)
    B = 2
    x = jnp.asarray(rng.standard_normal((B, 4, size, size)) * 0.5,
                    jnp.bfloat16)
    t = jnp.asarray([500.0] * B, jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, 1, 300, 4096)) * 0.1,
                    jnp.bfloat16)
    mask = jnp.ones((B, 300), jnp.int32)
    init_args = (x, t, y, mask)
    fp_vars = _build_variables(model_fp, None, init_args, jax, jnp)
    q_vars = _build_variables(model_q, res, init_args, jax, jnp)
    # share weights so rel-err compares like with like
    q_vars = {**q_vars, "params": fp_vars["params"]}

    # momentum CB needs act_scale stats: one sq_stat pass, then weight
    # tables re-derived per timerange against them + repacked (the PTQ
    # driver's phase order, pipelines/ptq.py)
    from viditq_tpu.quant import calibrate_weight_tables
    from viditq_tpu.quant.native_pack import pack_native_weights

    @jax.jit
    def sq_stat(vs, x):
        _, muts = model_q.apply(
            vs, x, t, y, mask, qctx=QuantCtx(mode="sq_stat"),
            mutable=["quant", "qstats"])
        q = calibrate_weight_tables(vs["params"], muts["quant"], res)
        q = pack_native_weights(vs["params"], q, res)
        return {"params": vs["params"], "quant": q,
                "qstats": muts["qstats"]}
    q_vars = sq_stat(q_vars, x)
    jax.block_until_ready(q_vars)

    qctx = QuantCtx(mode="quant", t_id=jnp.asarray(500, jnp.int32))

    @jax.jit
    def fp_fwd(vs, x):
        return model_fp.apply(vs, x, t, y, mask)

    @jax.jit
    def q_fwd(vs, x):
        # qctx by KEYWORD: the 6th positional slot is data_info
        return model_q.apply(vs, x, t, y, mask, qctx=qctx)

    bench = _timer()
    t_fp = bench(fp_fwd, fp_vars, x)
    t_q = bench(q_fwd, q_vars, x)
    out_fp = fp_fwd(fp_vars, x)
    out_q = q_fwd(q_vars, x)
    rel = float(jnp.linalg.norm((out_q - out_fp).astype(jnp.float32))
                / jnp.linalg.norm(out_fp.astype(jnp.float32)))
    print(json.dumps({
        "arm": "pixart_sigma_1024_kvcompress_w4a8_cb",
        "bf16_ms_per_fwd": round(t_fp * 1e3, 2),
        "w4a8cb_ms_per_fwd": round(t_q * 1e3, 2),
        "speedup": round(t_fp / t_q, 3),
        "rel_err_vs_bf16": round(rel, 4),
    }))
    _maybe_profile("sigma_bf16", fp_fwd, fp_vars, x)
    _maybe_profile("sigma_q", q_fwd, q_vars, x)


def arm_latte():
    import jax
    import jax.numpy as jnp
    from viditq_tpu.models import Latte_XL_2
    from viditq_tpu.pipelines.mixed_precision import build_mp_sampler
    from viditq_tpu.pipelines.analysis import (block_group_to_range_scores,
                                               generate_mp_config)  # noqa
    from viditq_tpu.samplers import IDDPM
    from viditq_tpu.utils.config import load_quant_config

    latent = (4, 8, 8) if TINY else (16, 32, 32)
    n_steps = 20  # mp_w tiles 20 steps
    import dataclasses
    plan = load_quant_config(
        "configs/opensora/w4a8_timestep_aware_cb.yaml").with_backend("fused")
    if os.environ.get("VIDITQ_CB_SHARE", "1") == "1":  # default on: queue-6 A/B
        d = plan.default_layer
        plan = dataclasses.replace(plan, default_layer=dataclasses.replace(
            d, smooth_quant=dataclasses.replace(d.smooth_quant,
                                                qkv_share_cs=True)))
    if os.environ.get("VIDITQ_ALLSYM") == "1":
        # see arm_w4a8: sym x sym variant (emission + zp-free epilogues)
        d = plan.default_layer
        plan = dataclasses.replace(plan, default_layer=dataclasses.replace(
            d, weight=dataclasses.replace(d.weight, sym=True),
            act=dataclasses.replace(d.act, sym=True)))
    res = plan.resolver()

    from viditq_tpu.models.dit import Latte

    def model_ctor(r):
        kw = {} if r is None else {"resolver": r}
        if TINY:
            return Latte(input_size=latent, condition="text",
                         caption_channels=4096, **TINY_NET, **kw)
        return Latte_XL_2(input_size=latent, condition="text",
                          caption_channels=4096, **kw)

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 4, *latent)) * 0.5, jnp.bfloat16)
    y_c = jnp.asarray(rng.standard_normal((1, 1, 1, 4096)) * 0.1,
                      jnp.bfloat16)
    y = jnp.concatenate([y_c, y_c * 0], axis=0)
    mask = None

    model = model_ctor(res)
    init_args = (z, jnp.zeros((1,)), y[:1])
    variables = _build_variables(model, res, init_args, jax, jnp)

    # smooth-quant act stats per CB timerange (same phase order as
    # arm_w4a8 — without this the CB scales are zero => identity)
    from viditq_tpu.quant import QuantCtx, calibrate_weight_tables
    smooth = plan.default_layer.smooth_quant
    t_probes = [int((lo + hi) // 2) for lo, hi in smooth.timerange]

    @jax.jit
    def sq_stat(vs):
        q = vs["quant"]
        for t_probe in t_probes:
            _, muts = model.apply(
                {**vs, "quant": q}, *init_args,
                qctx=QuantCtx(mode="sq_stat",
                              t_id=jnp.asarray(t_probe, jnp.int32)),
                mutable=["quant", "qstats"])
            q = muts["quant"]
        q = calibrate_weight_tables(vs["params"], q, res)
        return {"params": vs["params"], "quant": q,
                "qstats": muts["qstats"]}
    variables = sq_stat(variables)
    jax.block_until_ready(variables)

    # uniform 4-range MP: attn 4-bit, mlp 8-bit in the middle ranges,
    # everything 8-bit at the ends (a t20-style allocation for Latte)
    names_a = [f"blocks.{i}.attn" for i in range(28)]
    names_m = [f"blocks.{i}.mlp" for i in range(28)]
    mp_w = {"fp_layers": []}
    for rng_key, attn_bits in (("19-15", 8), ("14-10", 4), ("9-5", 4),
                               ("4-0", 8)):
        mp_w[rng_key] = {**{n: attn_bits for n in names_a},
                         **{n: 8 for n in names_m}}

    sampler = IDDPM(num_sampling_steps=n_steps, cfg_scale=4.0)
    model_fp = model_ctor(None)
    fp_vars = {"params": variables["params"]}

    @jax.jit
    def fp_denoise(vs, z):
        return sampler.sample(lambda x, t, yy, mm, qctx:
                              model_fp.apply(vs, x, t, yy),
                              z, y, mask, sampler_type="ddim")

    mp_fn = build_mp_sampler(model_ctor, sampler, plan, mp_w, None)
    mp_vars = (mp_fn.prepare(variables, z, y, mask)
               if hasattr(mp_fn, "prepare") else variables)
    jax.block_until_ready(mp_vars)

    def mp_run(z):
        return mp_fn(mp_vars, z, y, mask)

    bench = _timer()
    t_fp = bench(fp_denoise, fp_vars, z) / n_steps
    t_mp = bench(mp_run, z) / n_steps
    out_fp = fp_denoise(fp_vars, z)
    out_mp = mp_run(z)
    rel = float(jnp.linalg.norm((out_mp - out_fp).astype(jnp.float32))
                / jnp.linalg.norm(out_fp.astype(jnp.float32)))
    print(json.dumps({
        "arm": "latte_xl2_16x256x256_w4a8_timestep_mp",
        "allsym": os.environ.get("VIDITQ_ALLSYM") == "1",
        "single_scan": hasattr(mp_fn, "n_ranges"),
        "bf16_ms_per_step": round(t_fp * 1e3, 2),
        "w4a8mp_ms_per_step": round(t_mp * 1e3, 2),
        "speedup": round(t_fp / t_mp, 3),
        "rel_err_vs_bf16": round(rel, 4),
    }))
    _maybe_profile("latte_bf16", fp_denoise, fp_vars, z)
    _maybe_profile("latte_mp", mp_run, z)


def arm_mmdit():
    """BASELINE stretch config: SD3-class MMDiT W4A8 (rectified flow),
    single CFG-style forward B=2, 1024x1024 latent 128."""
    import jax
    import jax.numpy as jnp
    from viditq_tpu.models.mmdit import MMDiT
    from viditq_tpu.quant import QuantCtx
    from viditq_tpu.utils.config import load_quant_config

    # the dedicated MMDiT plan: txt-stream linears fp BY PLAN (tiny-M
    # quant overhead costs more than it saves — measured round-4 A/B,
    # 0.632x -> 0.936x; the img stream holds ~93% of weights/FLOPs).
    # VIDITQ_MMDIT_TXT_QUANT=1 re-enables the all-quant A/B.
    cfg = ("configs/opensora/w4a8_tpu_fused.yaml"
           if os.environ.get("VIDITQ_MMDIT_TXT_QUANT") == "1"
           else "configs/mmdit/w4a8_tpu_fused.yaml")
    plan = load_quant_config(cfg)
    if os.environ.get("VIDITQ_ALLSYM") == "1":
        # see arm_w4a8: sym x sym variant (emission + zp-free epilogues)
        import dataclasses
        d = plan.default_layer
        plan = dataclasses.replace(plan, default_layer=dataclasses.replace(
            d, weight=dataclasses.replace(d.weight, sym=True),
            act=dataclasses.replace(d.act, sym=True)))
    res = plan.resolver()
    size = 16 if TINY else 128
    kw = dict(input_size=size, patch_size=2, in_channels=4,
              hidden_size=1152, depth=24, num_heads=16,
              caption_channels=4096, model_max_length=77)
    model_fp = MMDiT(**kw)
    model_q = MMDiT(resolver=res, **kw)
    rng = np.random.default_rng(0)
    B = 2
    x = jnp.asarray(rng.standard_normal((B, 4, size, size)) * 0.5,
                    jnp.bfloat16)
    t = jnp.asarray([0.5] * B, jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, 1, 77, 4096)) * 0.1,
                    jnp.bfloat16)
    mask = jnp.ones((B, 77), jnp.int32)
    init_args = (x, t, y, mask)
    fp_vars = _build_variables(model_fp, None, init_args, jax, jnp)
    q_vars = _build_variables(model_q, res, init_args, jax, jnp)
    q_vars = {**q_vars, "params": fp_vars["params"]}
    from viditq_tpu.quant import calibrate_weight_tables
    from viditq_tpu.quant.native_pack import pack_native_weights

    @jax.jit
    def recal(p, q):
        q = jax.tree.map(jnp.zeros_like, q)
        q = calibrate_weight_tables(p, q, res)
        return pack_native_weights(p, q, res)
    q_vars["quant"] = recal(q_vars["params"], q_vars["quant"])

    qctx = QuantCtx(mode="quant", t_id=jnp.asarray(500, jnp.int32))

    @jax.jit
    def fp_fwd(vs, x):
        return model_fp.apply(vs, x, t, y, mask)

    @jax.jit
    def q_fwd(vs, x):
        return model_q.apply(vs, x, t, y, mask, qctx=qctx)

    bench = _timer()
    t_fp = bench(fp_fwd, fp_vars, x)
    t_q = bench(q_fwd, q_vars, x)
    out_fp = fp_fwd(fp_vars, x)
    out_q = q_fwd(q_vars, x)
    rel = float(jnp.linalg.norm((out_q - out_fp).astype(jnp.float32))
                / jnp.linalg.norm(out_fp.astype(jnp.float32)))
    print(json.dumps({
        "arm": "mmdit_1024_w4a8_stretch",
        "bf16_ms_per_fwd": round(t_fp * 1e3, 2),
        "w4a8_ms_per_fwd": round(t_q * 1e3, 2),
        "speedup": round(t_fp / t_q, 3),
        "rel_err_vs_bf16": round(rel, 4),
    }))
    _maybe_profile("mmdit_bf16", fp_fwd, fp_vars, x)
    _maybe_profile("mmdit_q", q_fwd, q_vars, x)


ARMS = {"w4a8": arm_w4a8, "t20mp": arm_t20mp, "sigma1024": arm_sigma1024,
        "latte": arm_latte, "mmdit": arm_mmdit}


def main(names):
    import jax
    # honor JAX_PLATFORMS=cpu for smoke runs: the image's preloaded TPU
    # plugin overrides the env var, config.update still wins (cli.py)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat.split(",")[0])
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rc = 0
    for n in names or list(ARMS):
        print(f"=== {n} ===", file=sys.stderr, flush=True)
        try:
            ARMS[n]()
        except Exception:
            # one arm's device fault (OOM, transient TPU error) must not
            # void the remaining arms' measurements
            import traceback
            traceback.print_exc()
            rc = 1
    sys.exit(rc)


if __name__ == "__main__":
    main(sys.argv[1:])
