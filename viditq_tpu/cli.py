"""Command-line entry points — the reference's public script surface as one
CLI (`python -m viditq_tpu.cli <command> ...`).

Command map to the reference scripts (SURVEY §1 L5):
  split-ckpt        <- t2v/scripts/split_ckpt.py (+ torch->flax conversion)
  get-text-embeds   <- t2v/scripts/get_text_embeds.py
  inference         <- t2v/scripts/inference.py, t2i/scripts/inference.py
  get-calib-data    <- t2v/scripts/get_calib_data.py, t2i analog
  ptq               <- t2v/scripts/ptq.py, t2i/scripts/ptq.py
  quant-generate    <- t2v/scripts/quant_txt2video.py, t2i quant_txt2img.py
  quant-generate-mp <- t2v/scripts/quant_txt2video_mp.py
  get-sensitivity   <- t2v/scripts/get_sensitivity.py
  sweep-alpha       <- t2v/scripts/sweep_alpha.py
  smooth-quant-list <- t2v/scripts/get_smooth_quant_list.py
  calibrate-ptqd-k  <- t2v/scripts/calibrate_ptqd_k.py
  extract-features  <- t2i/scripts (feature extraction)
  train             <- t2v/scripts/train.py (epoch loop, resumable)
  export            (beyond reference) AOT StableHLO serving artifacts
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
from typing import Optional

import numpy as np


def _apply_platform_env():
    """Honor JAX_PLATFORMS for CLI runs. The environment's TPU plugin
    registers itself via sitecustomize and re-pins the platform AFTER
    jax's env parsing, so the documented `JAX_PLATFORMS=cpu viditq ...`
    recipe (verify skill) silently ran tiny flows over the tunneled TPU —
    latency-bound at thousands of micro-dispatches. config.update wins
    over the plugin's pin."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def _common(parser):
    parser.add_argument("--config", required=True,
                        help="python workload config (16x512x512.py style)")
    parser.add_argument("--ckpt_path", default=None,
                        help="flax params msgpack (from split-ckpt)")
    parser.add_argument("--text_embeds_path", default=None,
                        help="precomputed text embeds npz")
    parser.add_argument("--save_dir", default="outputs")
    parser.add_argument("--batch_ids", default=None,
                        help="comma-separated prompt indices")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--sampler_type", default="ddim",
                        choices=["ddim", "iddpm", "dpms", "dpm-solver",
                                 "sa-solver", "lcm", "edm"])


def _quant_args(parser):
    parser.add_argument("--ptq_config", required=True,
                        help="quant plan YAML (reference schema)")
    parser.add_argument("--quant_ckpt", default=None,
                        help="quant-params npz (from ptq)")
    parser.add_argument("--part_fp", action="store_true", default=True)
    parser.add_argument("--timestep_wise", action="store_true")
    parser.add_argument("--smooth_quant_alpha", type=float, default=None)
    parser.add_argument("--backend", default="simulate",
                        choices=["simulate", "native"])


def _setup(args, quant: bool = False):
    import jax
    import jax.numpy as jnp
    from viditq_tpu.utils import workload
    from viditq_tpu.utils.config import load_quant_config

    cfg = workload.load_py_config(args.config)
    plan = resolver = None
    if quant:
        plan = load_quant_config(
            args.ptq_config, part_fp=args.part_fp,
            timestep_wise=getattr(args, "timestep_wise", False),
            smooth_quant_alpha=getattr(args, "smooth_quant_alpha", None))
        if getattr(args, "backend", "simulate") == "native":
            plan = plan.with_backend("native")
        resolver = plan.resolver()
    model = workload.build_model(cfg, resolver=resolver)
    sampler = workload.build_sampler(
        cfg, cfg_split=bool(plan.cfg_split) if plan else False,
        override_type=getattr(args, "sampler_type", None))
    return cfg, plan, resolver, model, sampler


def _load_embeds(args, cfg, n_default=2):
    from viditq_tpu.models.text_encoder import PrecomputedTextEmbeds
    if args.text_embeds_path and os.path.exists(args.text_embeds_path):
        emb = PrecomputedTextEmbeds(args.text_embeds_path)
        ids = ([int(i) for i in args.batch_ids.split(",")]
               if args.batch_ids else list(range(min(n_default, len(emb.y)))))
        sel = emb.select(ids)
        return sel["y"], sel["mask"]
    # smoke mode: random embeds (lets every flow run without assets)
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    print("[viditq] no text embeds provided; using random embeds",
          file=sys.stderr)
    mcfg = cfg.get("model", {})
    cap = mcfg.get("caption_channels", 4096)
    L = mcfg.get("model_max_length", 120)
    y = jnp.asarray(rng.standard_normal((2 * n_default, 1, L, cap)),
                    jnp.float32)
    mask = jnp.ones((n_default, L), jnp.int32)
    return y, mask


def _init_variables(model, args, z, y, mask, quant_mode="fp"):
    import jax
    import jax.numpy as jnp
    from viditq_tpu.quant.qlinear import QuantCtx
    from viditq_tpu.utils import ckpt as ckpt_utils

    n = z.shape[0]
    t0 = jnp.zeros((n,), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), z, t0, y[:n], mask,
                           qctx=QuantCtx(mode=quant_mode)))()
    variables = dict(variables)
    if args.ckpt_path:
        variables["params"] = ckpt_utils.load_params(args.ckpt_path,
                                                     variables["params"])
    return variables


def cmd_split_ckpt(args):
    """torch .pth -> flax msgpack with fused-qkv split."""
    from viditq_tpu.utils import ckpt as ckpt_utils
    if args.model_type == "opensora":
        params = ckpt_utils.convert_stdit_checkpoint(args.src)
    else:
        params = ckpt_utils.convert_pixart_checkpoint(args.src)
    ckpt_utils.save_params(args.dst, params)
    print(f"converted {args.src} -> {args.dst}")


def cmd_get_text_embeds(args):
    from viditq_tpu.models.text_encoder import T5Encoder, save_text_embeds
    with open(args.prompt_path) as f:
        prompts = [ln.strip() for ln in f if ln.strip()]
    enc = T5Encoder(args.t5_path, model_max_length=args.model_max_length)
    null = np.zeros((args.model_max_length, enc.output_dim), np.float32)
    if args.null_embedding_path:
        null = np.load(args.null_embedding_path)
    save_text_embeds(args.dst, enc, prompts, null)
    print(f"saved embeds for {len(prompts)} prompts -> {args.dst}")


def cmd_inference(args):
    import jax
    import jax.numpy as jnp
    from viditq_tpu.pipelines import inference as inf
    from viditq_tpu.utils import workload
    cfg, _, _, model, sampler = _setup(args)
    ls = workload.latent_size(cfg)
    n = args.num_samples
    y, mask = _load_embeds(args, cfg, n)
    rng = jax.random.PRNGKey(args.seed)
    z = jax.random.normal(rng, (n, 4, *ls), jnp.float32)
    variables = _init_variables(model, args, z, y, mask)
    samples = inf.fp_sample(model, variables, sampler, z, y, mask,
                            rng=rng, sampler_type=args.sampler_type)
    out = os.path.join(args.save_dir, "fp_samples.npz")
    os.makedirs(args.save_dir, exist_ok=True)
    np.savez(out, samples=np.asarray(samples))
    print(f"saved {samples.shape} -> {out}")


def cmd_get_calib_data(args):
    import jax
    import jax.numpy as jnp
    from viditq_tpu.pipelines import inference as inf
    from viditq_tpu.utils import workload
    cfg, _, _, model, sampler = _setup(args)
    ls = workload.latent_size(cfg)
    n = args.num_samples
    y, mask = _load_embeds(args, cfg, n)
    rng = jax.random.PRNGKey(args.seed)
    z = jax.random.normal(rng, (n, 4, *ls), jnp.float32)
    variables = _init_variables(model, args, z, y, mask)
    calib = inf.get_calib_data(model, variables, sampler, z, y, mask,
                               rng=rng, sampler_type=args.sampler_type)
    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(args.save_dir, "calib_data.npz")
    np.savez(out, xs=np.asarray(calib["xs"]), ts=np.asarray(calib["ts"]),
             y=np.asarray(calib["y"]),
             mask=np.asarray(calib["mask"]) if calib["mask"] is not None
             else np.ones(0))
    print(f"saved calib trajectories {calib['xs'].shape} -> {out}")


def cmd_ptq(args):
    import jax
    import jax.numpy as jnp
    from viditq_tpu.pipelines.ptq import run_ptq
    from viditq_tpu.utils import ckpt as ckpt_utils, workload
    from viditq_tpu.utils.logging import log_invocation, setup_logger
    logger = setup_logger(args.save_dir, "ptq_run")
    log_invocation(logger, args)
    cfg, plan, resolver, model, sampler = _setup(args, quant=True)
    # snapshot the quant plan beside the outputs for reproducibility
    # (reference ptq.py:41-47 copies the YAML + qdiff tree; ptq.py:135-148
    # rewrites --smooth_quant_alpha into the copy)
    os.makedirs(args.save_dir, exist_ok=True)
    with open(args.ptq_config) as f:
        plan_yaml = __import__("yaml").safe_load(f)
    if getattr(args, "smooth_quant_alpha", None) is not None:
        sq = (plan_yaml.get("quant", {}).get("activation", {})
              .get("quantizer", {}).get("smooth_quant"))
        if sq and sq.get("enable"):  # the live run gates on enable too
            sq["alpha"] = args.smooth_quant_alpha
    with open(os.path.join(args.save_dir, "quant_config_snapshot.yaml"),
              "w") as f:
        __import__("yaml").safe_dump(plan_yaml, f, sort_keys=False)
    data = np.load(args.calib_data)
    calib = {"xs": data["xs"], "ts": data["ts"], "y": data["y"],
             "mask": data["mask"] if data["mask"].size else None}
    n = calib["xs"].shape[1] // 2
    y = jnp.asarray(calib["y"])
    mask = (jnp.asarray(calib["mask"]) if calib["mask"] is not None else None)
    z = jnp.asarray(calib["xs"][0, :n])
    variables = _init_variables(model, args, z, y, mask)
    res = run_ptq(model, variables, calib, plan, resolver,
                  resume_w_quantized=getattr(
                      args, "resume_with_w_quantized", None))
    # optimization-based reconstruction: runs when the plan's YAML carries
    # `quant.weight.optimization.params` and AdaRound rounding — the
    # reference's use_optimization gate (t2i/scripts/ptq.py:320-359)
    wopt = plan.weight_opt
    wspec = plan.default_layer.weight
    if (wopt is not None and wopt.enabled and wspec is not None
            and wspec.round_mode == "learned_hard_sigmoid"):
        from viditq_tpu.quant.reconstruction import (
            ReconConfig, capture_layer_io, model_block_reconstruction,
            model_reconstruction)
        rcfg = ReconConfig(
            iters=wopt.iters, batch_size=plan.calib_batch_size,
            lr_alpha=wopt.alpha_lr or 1e-3,
            lr_delta=wopt.delta_lr or 4e-5,
            lambda_coeff=wopt.lambda_coeff, warmup=wopt.warmup,
            opt_target=("weight_and_activation" if wopt.joint_weight_act
                        else "weight"))
        t0 = jnp.asarray(calib["ts"][0], jnp.float32)
        x0 = jnp.asarray(calib["xs"][0])
        recon_args = (x0, t0, y, mask)
        logger.info("reconstruction: granularity=%s iters=%d",
                    wopt.granularity, wopt.iters)
        if wopt.granularity == "block":
            res.variables = model_block_reconstruction(
                model, res.variables, recon_args, rcfg, mask=mask)
        else:
            io = capture_layer_io(model, res.variables, recon_args)
            res.variables = model_reconstruction(res.variables, io,
                                                 resolver, rcfg)
    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(args.save_dir, "quant_ckpt.npz")
    meta = {"act_slot_map": res.act_slot_map, "calib_ts": res.calib_ts,
            "ptq_config": args.ptq_config}
    ckpt_utils.save_quant_ckpt(out, res.variables["quant"], meta)
    print(f"saved quant params -> {out}")


def cmd_export(args):
    """AOT-export the (quantized) model forward to a StableHLO artifact
    (utils/export.py): serve from the blob without trace+compile."""
    import jax
    import jax.numpy as jnp
    from viditq_tpu.quant import QuantCtx
    from viditq_tpu.utils import ckpt as ckpt_utils, workload
    from viditq_tpu.utils.export import export_quant_forward
    cfg, plan, resolver, model, sampler = _setup(args, quant=True)
    ls = workload.latent_size(cfg)
    B = args.batch_size
    mcfg = cfg.get("model", {})
    L = mcfg.get("model_max_length", 120)
    Ccap = mcfg.get("caption_channels", 4096)
    x = jnp.zeros((B, 4, *ls), jnp.float32)
    t = jnp.zeros((B,), jnp.float32)
    y = jnp.zeros((B, 1, L, Ccap), jnp.float32)
    mask = jnp.ones((B, L), jnp.int32)
    variables = _init_variables(model, args, x, y, mask, quant_mode="fp")
    if args.quant_ckpt:
        variables["quant"], _ = ckpt_utils.load_quant_ckpt(
            args.quant_ckpt, variables["quant"])
    else:
        import functools
        from viditq_tpu.quant import calibrate_weight_tables
        variables["quant"] = jax.jit(functools.partial(
            calibrate_weight_tables, resolve=resolver))(
                variables["params"], variables["quant"])
    if plan.uses_native():
        import functools
        from viditq_tpu.quant.native_pack import (add_native_slots,
                                                  pack_native_weights)
        variables["quant"] = add_native_slots(variables["quant"],
                                              variables["params"], resolver)
        variables["quant"] = jax.jit(functools.partial(
            pack_native_weights, resolve=resolver))(
                variables["params"], variables["quant"])
    qctx = QuantCtx(mode="quant", t_id=jnp.asarray(0, jnp.int32))
    platforms = args.platforms.split(",") if args.platforms else None
    blob = export_quant_forward(model, variables, x, t, y, mask,
                                qctx=qctx, platforms=platforms)
    with open(args.dst, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob)} bytes -> {args.dst} "
          f"(shapes x={tuple(x.shape)}, platforms={platforms or 'host'})")


def cmd_quant_generate(args, mp: bool = False):
    import jax
    import jax.numpy as jnp
    from viditq_tpu.pipelines import inference as inf
    from viditq_tpu.utils import ckpt as ckpt_utils, workload
    from viditq_tpu.utils.logging import log_invocation, setup_logger
    logger = setup_logger(args.save_dir, "quant_inference_run")
    log_invocation(logger, args)
    cfg, plan, resolver, model, sampler = _setup(args, quant=True)
    ls = workload.latent_size(cfg)
    n = args.num_samples
    y, mask = _load_embeds(args, cfg, n)
    rng = jax.random.PRNGKey(args.seed)
    z = jax.random.normal(rng, (n, 4, *ls), jnp.float32)
    variables = _init_variables(model, args, z, y, mask, quant_mode="fp")
    act_slot_map = None
    if args.quant_ckpt:
        variables["quant"], meta = ckpt_utils.load_quant_ckpt(
            args.quant_ckpt, variables["quant"])
        if meta:
            act_slot_map = meta.get("act_slot_map")
    else:
        from viditq_tpu.quant import calibrate_weight_tables
        print("[viditq] no quant ckpt; calibrating weights from params",
              file=sys.stderr)
        variables["quant"] = jax.jit(functools.partial(
            calibrate_weight_tables, resolve=resolver))(
                variables["params"], variables["quant"])
    if plan.uses_native():
        from viditq_tpu.quant.native_pack import (add_native_slots,
                                                  pack_native_weights)
        variables["quant"] = add_native_slots(variables["quant"],
                                              variables["params"], resolver)
        variables["quant"] = jax.jit(functools.partial(
            pack_native_weights, resolve=resolver))(
                variables["params"], variables["quant"])
    if mp:
        import yaml
        from viditq_tpu.pipelines.mixed_precision import mp_quant_sample
        from viditq_tpu.utils import workload as wl
        with open(args.time_mp_config_weight) as f:
            mp_w = yaml.safe_load(f)
        mp_a = None
        if args.time_mp_config_act:
            with open(args.time_mp_config_act) as f:
                mp_a = yaml.safe_load(f)
        model_ctor = lambda r: wl.build_model(cfg, resolver=r)
        samples = mp_quant_sample(model_ctor, variables, sampler, z, y, mask,
                                  plan, mp_w, mp_a,
                                  act_slot_map=act_slot_map, rng=rng)
    else:
        samples = inf.quant_sample(model, variables, sampler, z, y, mask,
                                   rng=rng, act_slot_map=act_slot_map,
                                   sampler_type=args.sampler_type)
    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(args.save_dir, "quant_samples.npz")
    np.savez(out, samples=np.asarray(samples))
    print(f"saved {samples.shape} -> {out}")


def cmd_get_sensitivity(args):
    import jax
    import jax.numpy as jnp
    from viditq_tpu.pipelines import analysis
    from viditq_tpu.samplers.iddpm import default_qctx_factory
    from viditq_tpu.utils import workload
    cfg, plan, _, _, sampler = _setup(args, quant=True)
    ls = workload.latent_size(cfg)
    y, mask = _load_embeds(args, cfg, 1)
    rng = jax.random.PRNGKey(args.seed)
    z = jax.random.normal(rng, (1, 4, *ls), jnp.float32)
    base = plan.default_layer
    params_holder = {}

    from viditq_tpu.utils.metrics import make_sensitivity_metric
    prompts = None
    if getattr(args, "prompts", None):
        if os.path.exists(args.prompts):
            with open(args.prompts) as f:
                prompts = [ln.strip() for ln in f if ln.strip()]
        else:
            prompts = args.prompts.split(",")
    # comma-separated metrics run the multi-vector loop (the reference's
    # clip/flow/vqa sensitivity vectors combined in metric.ipynb): one
    # generation per target, every metric scores it, rank-combined.
    metric_names = getattr(args, "metric", "mse").split(",")
    metric_fns = {
        m: make_sensitivity_metric(
            m, prompts=prompts,
            clip_model_path=getattr(args, "clip_model", None))
        for m in metric_names}
    metric_fn = metric_fns[metric_names[0]]

    def run_with_resolver(resolver):
        from viditq_tpu.quant import calibrate_weight_tables
        model = workload.build_model(cfg, resolver=resolver)
        vs = _init_variables(model, args, z, y, mask)
        if params_holder:
            vs["params"] = params_holder["p"]
        else:
            params_holder["p"] = vs["params"]
        if "quant" in vs:
            vs["quant"] = jax.jit(functools.partial(
                calibrate_weight_tables, resolve=resolver))(
                    vs["params"], vs["quant"])
        def apply_fn(x, t, yy, mm, qctx):
            return model.apply(vs, x, t, yy, mm, qctx=qctx)
        return sampler.sample(apply_fn, z, y, mask,
                              sampler_type=args.sampler_type,
                              qctx_factory=default_qctx_factory("quant"))

    if getattr(args, "block_group_wise_quant", False):
        # block x group x timestep-window mode (reference
        # get_sensitivity.py block_group_wise_quant)
        from viditq_tpu.quant import calibrate_weight_tables

        fp_model = workload.build_model(cfg, resolver=None)
        fp_vs = _init_variables(fp_model, args, z, y, mask)
        params_holder["p"] = fp_vs["params"]

        def fp_apply(x, t, yy, mm, qctx=None):
            return fp_model.apply(fp_vs, x, t, yy, mm)

        def make_q_apply(resolver):
            model = workload.build_model(cfg, resolver=resolver)
            vs = _init_variables(model, args, z, y, mask)
            vs["params"] = params_holder["p"]
            if "quant" in vs:
                vs["quant"] = jax.jit(functools.partial(
                    calibrate_weight_tables, resolve=resolver))(
                        vs["params"], vs["quant"])

            def q_apply(x, t, yy, mm, qctx):
                return model.apply(vs, x, t, yy, mm, qctx=qctx)
            return q_apply

        groups = (args.targets.split(",") if args.targets
                  else list(analysis.QUANT_GROUPS))
        bits = ([int(b) for b in args.block_group_bits.split(",")]
                if args.block_group_bits else [4, 6, 8])
        scores = analysis.block_group_sensitivity(
            sampler, fp_apply, make_q_apply, z, y, mask, base,
            n_blocks=fp_model.depth,
            qctx_factory=default_qctx_factory("quant"), groups=groups,
            bits=bits, split_timestep=args.split_timestep,
            fp_patterns=plan.fp_patterns, metric_fn=metric_fn)
    else:
        targets = (args.targets.split(",") if args.targets
                   else list(analysis.QUANT_GROUPS))
        if len(metric_fns) > 1:
            vectors = analysis.sensitivity_scan_multi(
                run_with_resolver, base, targets, metric_fns,
                fp_patterns=plan.fp_patterns)
            scores = {"combined": analysis.combine_sensitivity(vectors),
                      "per_metric": vectors}
        else:
            scores = analysis.sensitivity_scan(
                run_with_resolver, base, targets,
                fp_patterns=plan.fp_patterns, metric_fn=metric_fn)
    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(args.save_dir, "sensitivity.json")
    with open(out, "w") as f:
        json.dump(scores, f, indent=2)
    print(json.dumps(scores, indent=2))


def cmd_sweep_alpha(args):
    import jax
    import jax.numpy as jnp
    from viditq_tpu.pipelines import analysis
    from viditq_tpu.utils import workload
    cfg, plan, resolver, model, _ = _setup(args, quant=True)
    ls = workload.latent_size(cfg)
    y, mask = _load_embeds(args, cfg, 1)
    rng = jax.random.PRNGKey(args.seed)
    z = jax.random.normal(rng, (1, 4, *ls), jnp.float32)
    variables = _init_variables(model, args, z, y, mask)
    t0 = jnp.full((1,), 500.0)
    best = analysis.sweep_alpha(model, variables, (z, t0, y[:1], mask),
                                resolver)
    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(args.save_dir, "best_alpha.json")
    with open(out, "w") as f:
        json.dump(best, f, indent=2)
    print(f"saved per-layer alpha -> {out}")


def cmd_smooth_quant_list(args):
    import jax
    import jax.numpy as jnp
    from viditq_tpu.pipelines import analysis
    from viditq_tpu.utils import workload
    cfg, plan, resolver, model, _ = _setup(args, quant=True)
    ls = workload.latent_size(cfg)
    y, mask = _load_embeds(args, cfg, 1)
    rng = jax.random.PRNGKey(args.seed)
    z = jax.random.normal(rng, (1, 4, *ls), jnp.float32)
    variables = _init_variables(model, args, z, y, mask)
    t0 = jnp.full((1,), 500.0)
    picks = analysis.smooth_quant_candidates(
        model, variables, (z, t0, y[:1], mask), resolver,
        act_ratio_threshold=args.threshold)
    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(args.save_dir, "smooth_quant_list.txt")
    with open(out, "w") as f:
        f.write("\n".join(picks) + "\n")
    print(f"{len(picks)} CB candidates -> {out}")


def cmd_extract_features(args):
    """Pre-extract VAE latents for a dataset CSV (reference
    t2i/tools/extract_features.py: T5/VAE feature pre-extraction; text
    embeds are the separate get-text-embeds command)."""
    import jax
    import jax.numpy as jnp
    from viditq_tpu.data.datasets import DatasetFromCSV, StatefulSampler, batch_iterator
    from viditq_tpu.models.vae import AutoencoderKL, VideoAutoencoderKL
    from viditq_tpu.utils import ckpt as ckpt_utils
    video = args.num_frames > 0
    ds = DatasetFromCSV(args.csv, num_frames=args.num_frames or None,
                        image_size=(args.image_size, args.image_size),
                        root=args.data_root)
    vae = (VideoAutoencoderKL() if video else AutoencoderKL())
    probe = jnp.asarray(ds[0]["video"])[None]
    variables = jax.jit(lambda: vae.init(jax.random.PRNGKey(0), probe))()
    if args.vae_ckpt:
        variables = {"params": ckpt_utils.load_params(args.vae_ckpt,
                                                      variables["params"])}
    else:
        print("[viditq] no VAE ckpt; using random-init VAE (structural run)",
              file=sys.stderr)
    encode = jax.jit(lambda x: vae.apply(variables, x, method=vae.encode))
    latents, texts = [], []
    sampler = StatefulSampler(len(ds), shuffle=False)
    for batch in batch_iterator(ds, sampler, args.batch_size):
        latents.append(np.asarray(encode(jnp.asarray(batch["video"]))))
        texts.extend(batch["text"])
    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(args.save_dir, "features.npz")
    np.savez(out, latents=np.concatenate(latents),
             texts=np.asarray(texts, dtype=object) if texts else
             np.zeros(0))
    print(f"saved {sum(l.shape[0] for l in latents)} latents -> {out}")


def cmd_train(args):
    """Reference t2v/scripts/train.py: synthetic-data smoke by default;
    --data_path drives the epoch-structured resumable loop over a CSV
    dataset with on-the-fly VAE encoding (train.py:93-120,218-224)."""
    import jax
    from viditq_tpu.pipelines.train import (make_encode_batch, train_entry,
                                            train_loop)
    from viditq_tpu.parallel.mesh import make_mesh
    from viditq_tpu.utils import workload
    cfg = workload.load_py_config(args.config)
    model = workload.build_model(cfg)
    ls = workload.latent_size(cfg)
    mcfg = cfg.get("model", {})
    cap_shape = (1, mcfg.get("model_max_length", 120),
                 mcfg.get("caption_channels", 4096))
    mesh = None
    if args.dp * args.sp * args.tp > 1:
        mesh = make_mesh(dp=args.dp, sp=args.sp, tp=args.tp)
    kw = dict(latent_shape=(4, *ls), caption_shape=cap_shape,
              lr=args.lr, ckpt_every=args.ckpt_every,
              save_dir=args.save_dir, mesh=mesh,
              grad_accum=args.grad_accum, grad_clip=args.grad_clip,
              warmup_steps=args.warmup_steps,
              ckpt_format=args.ckpt_format)
    if args.data_path:
        from viditq_tpu.data.datasets import DatasetFromCSV
        num_frames = cfg.get("num_frames")
        dataset = DatasetFromCSV(args.data_path, num_frames=num_frames,
                                 image_size=tuple(cfg.get("image_size",
                                                          (256, 256))))
        vae, vae_vars = None, None
        if not args.no_vae:
            from viditq_tpu.utils import ckpt as ckpt_utils
            vae = workload.build_vae(cfg)
            sample = jax.numpy.asarray(dataset[0]["video"])[None]
            vae_vars = vae.init(jax.random.PRNGKey(0), sample,
                                method=vae.encode)
            if args.vae_ckpt:
                vae_vars = {"params": ckpt_utils.load_params(
                    args.vae_ckpt, vae_vars["params"])}
            else:
                print("[viditq] training with a RANDOM-weight VAE "
                      "(pass --vae_ckpt for real latents)",
                      file=sys.stderr)
        out = train_entry(model, dataset, epochs=args.epochs,
                          batch_size=args.batch_size,
                          encode_batch=make_encode_batch(
                              vae, vae_vars, null_caption_shape=cap_shape),
                          resume_from=args.resume_from, **kw)
    else:
        out = train_loop(model, None, num_steps=args.num_steps,
                         resume_from=args.resume_from, **kw)
    if out is None:
        print("nothing to train: the resume checkpoint already covers "
              "the requested epochs")
        return
    print(f"trained; final loss "
          f"{out['losses'][-1] if out['losses'] else float('nan'):.4f}")


def cmd_calibrate_ptqd_k(args):
    from viditq_tpu.pipelines.analysis import calibrate_ptqd_k
    fp = np.load(args.fp_trajectory)["outs"]
    q = np.load(args.quant_trajectory)["outs"]
    k = calibrate_ptqd_k(fp, q)
    np.save(os.path.join(args.save_dir, "ptqd_k.npy"), k)
    print(f"k_t per step: {k}")


def main(argv=None):
    _apply_platform_env()
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/viditq_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    p = argparse.ArgumentParser(prog="viditq_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("split-ckpt")
    s.add_argument("--src", required=True)
    s.add_argument("--dst", required=True)
    s.add_argument("--model_type", default="opensora",
                   choices=["opensora", "pixart"])
    s.set_defaults(fn=cmd_split_ckpt)

    s = sub.add_parser("get-text-embeds")
    s.add_argument("--prompt_path", required=True)
    s.add_argument("--t5_path", required=True)
    s.add_argument("--dst", required=True)
    s.add_argument("--model_max_length", type=int, default=120)
    s.add_argument("--null_embedding_path", default=None)
    s.set_defaults(fn=cmd_get_text_embeds)

    for name, fn, quant, extra in [
        ("inference", cmd_inference, False, ()),
        ("get-calib-data", cmd_get_calib_data, False, ()),
        ("quant-generate", cmd_quant_generate, True, ()),
        ("quant-generate-mp",
         functools.partial(cmd_quant_generate, mp=True), True,
         ("--time_mp_config_weight", "--time_mp_config_act")),
        ("get-sensitivity", cmd_get_sensitivity, True,
         ("--targets", "--block_group_bits")),
        ("sweep-alpha", cmd_sweep_alpha, True, ()),
        ("smooth-quant-list", cmd_smooth_quant_list, True, ()),
    ]:
        s = sub.add_parser(name)
        _common(s)
        s.add_argument("--num_samples", type=int, default=2)
        if quant:
            _quant_args(s)
        for e in extra:
            s.add_argument(e, default=None)
        if name == "get-sensitivity":
            s.add_argument("--block_group_wise_quant", action="store_true",
                           help="block x group x timestep-window mode "
                                "(reference get_sensitivity.py "
                                "block_group_wise_quant)")
            s.add_argument("--split_timestep", type=int, default=4)
            s.add_argument("--metric", default="mse",
                           help="sensitivity score(s): any of mse / clip "
                                "/ clip_temp / flow, comma-separated for "
                                "the multi-vector loop (per-metric "
                                "vectors + rank-combined ranking, the "
                                "reference's clip/flow/vqa "
                                "metric-decoupled flow)")
            s.add_argument("--clip_model", default=None,
                           help="local FlaxCLIPModel dir for --metric "
                                "clip (default: tiny random-init CLIP — "
                                "plumbing-only scores)")
            s.add_argument("--prompts", default=None,
                           help="comma-separated prompts for --metric "
                                "clip (or a path to a prompt .txt, one "
                                "per line)")
        if name == "smooth-quant-list":
            s.add_argument("--threshold", type=float, default=10.0)
        s.set_defaults(fn=fn)

    s = sub.add_parser("ptq")
    _common(s)
    _quant_args(s)
    s.add_argument("--calib_data", required=True)
    s.add_argument("--resume_with_w_quantized", default=None,
                   help="prior quant-ckpt npz whose weight tables are "
                        "reused (skips weight calibration; the YAML "
                        "resume_with_w_quantized.path key works too)")
    s.set_defaults(fn=cmd_ptq)

    s = sub.add_parser("export")
    _common(s)
    _quant_args(s)
    s.add_argument("--dst", required=True,
                   help="output artifact path (StableHLO blob)")
    s.add_argument("--batch_size", type=int, default=2)
    s.add_argument("--platforms", default=None,
                   help="comma list, e.g. 'tpu' or 'cpu,tpu' "
                        "(default: current backend)")
    s.set_defaults(fn=cmd_export)

    s = sub.add_parser("extract-features")
    s.add_argument("--csv", required=True)
    s.add_argument("--data_root", default="")
    s.add_argument("--image_size", type=int, default=256)
    s.add_argument("--num_frames", type=int, default=0,
                   help="0 = image dataset")
    s.add_argument("--batch_size", type=int, default=4)
    s.add_argument("--vae_ckpt", default=None)
    s.add_argument("--save_dir", default="outputs/features")
    s.set_defaults(fn=cmd_extract_features)

    s = sub.add_parser("train")
    s.add_argument("--config", required=True)
    s.add_argument("--num_steps", type=int, default=100)
    s.add_argument("--lr", type=float, default=1e-4)
    s.add_argument("--ckpt_every", type=int, default=0)
    s.add_argument("--save_dir", default="outputs/train")
    s.add_argument("--dp", type=int, default=1)
    s.add_argument("--sp", type=int, default=1)
    s.add_argument("--tp", type=int, default=1)
    s.add_argument("--data_path", default=None,
                   help="CSV dataset (path,text rows); omit for synthetic")
    s.add_argument("--epochs", type=int, default=1)
    s.add_argument("--batch_size", type=int, default=2)
    s.add_argument("--grad_accum", type=int, default=1)
    s.add_argument("--grad_clip", type=float, default=0.0)
    s.add_argument("--warmup_steps", type=int, default=0)
    s.add_argument("--resume_from", default=None,
                   help="train_state_*.msgpack checkpoint to resume")
    s.add_argument("--no_vae", action="store_true",
                   help="feed pixel batches directly (tiny-latent smoke)")
    s.add_argument("--vae_ckpt", default=None,
                   help="flax params msgpack for the VAE encoder")
    s.add_argument("--ckpt_format", choices=("msgpack", "orbax"),
                   default="msgpack",
                   help="orbax = async, sharded-array-aware directories")
    s.set_defaults(fn=cmd_train)

    s = sub.add_parser("calibrate-ptqd-k")
    s.add_argument("--fp_trajectory", required=True)
    s.add_argument("--quant_trajectory", required=True)
    s.add_argument("--save_dir", default="outputs")
    s.set_defaults(fn=cmd_calibrate_ptqd_k)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
