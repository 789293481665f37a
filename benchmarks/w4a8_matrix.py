"""Factor-isolation matrix for the W4A8 full-recipe quality regression
(on-chip rel_err 0.1498 vs naive-W4's 0.077 — the full recipe should be
strictly better: 56/364 layers at W8 plus CB).

Runs a medium STDiT on CPU (XLA int path — fused Pallas unavailable) and
on TPU (fused) with the same seeds, over arms:
  naive-w4      all-layer W4, no CB, no MP
  mp-only       t20-style MP (qkv/proj at W8 in outer ranges), no CB
  cb-only       CB timerange smooth-quant, all-W4
  full          CB + MP (the bench arm's recipe)
Prints one JSON line per arm with rel_err vs bf16.

Usage: [VIDITQ_MATRIX_SCALE=medium|xl] python benchmarks/w4a8_matrix.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
if os.environ.get("VIDITQ_MATRIX_CPU") == "1":
    # env JAX_PLATFORMS alone is overridden by the preloaded TPU plugin
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from viditq_tpu.models.stdit import STDiT
from viditq_tpu.pipelines.mixed_precision import build_mp_sampler
from viditq_tpu.quant import QuantCtx, calibrate_weight_tables
from viditq_tpu.samplers import IDDPM
from viditq_tpu.utils.config import load_quant_config
from benchmarks.bench_configs import _build_variables

SCALE = os.environ.get("VIDITQ_MATRIX_SCALE", "medium")
if SCALE == "xl":
    latent = (16, 64, 64)
    NET = dict(depth=28, hidden_size=1152, num_heads=16)
else:
    latent = (8, 16, 16)
    NET = dict(depth=6, hidden_size=256, num_heads=4)
n_steps = 20

rng = np.random.default_rng(0)
z = jnp.asarray(rng.standard_normal((1, 4, *latent)) * 0.5, jnp.bfloat16)
y = jnp.asarray(rng.standard_normal((2, 1, 120, 4096)) * 0.1, jnp.bfloat16)
mask = jnp.ones((1, 120), jnp.int32)

base_plan = load_quant_config(
    "configs/opensora/w4a8_timestep_aware_cb.yaml").with_backend("fused")
scale_method = os.environ.get("VIDITQ_W4A8_SCALE")
if scale_method:
    d = base_plan.default_layer
    base_plan = dataclasses.replace(
        base_plan, default_layer=dataclasses.replace(
            d, weight=dataclasses.replace(d.weight,
                                          scale_method=scale_method)))


def variant(plan, cb: bool):
    if not cb:
        d = plan.default_layer
        plan = dataclasses.replace(plan, default_layer=dataclasses.replace(
            d, smooth_quant=dataclasses.replace(d.smooth_quant,
                                                enable=False)))
    return plan


def mp_cfg(depth, outer_w8: bool, all8: bool = False):
    """t20-shaped plan: 4 step ranges; in the two outer ranges attn qkv/proj
    go W8 (mimicking t20_weight_4_mp's 56-layers-at-8 shape), inner all W4.
    all8=True: every layer at 8 in every range (discriminator — should match
    plain W8A8)."""
    names = []
    for i in range(depth):
        names += [f"blocks.{i}.attn.qkv", f"blocks.{i}.attn.proj",
                  f"blocks.{i}.attn_temp.qkv", f"blocks.{i}.attn_temp.proj",
                  f"blocks.{i}.cross_attn.q_linear",
                  f"blocks.{i}.cross_attn.kv_linear",
                  f"blocks.{i}.cross_attn.proj",
                  f"blocks.{i}.mlp.fc1", f"blocks.{i}.mlp.fc2"]
    def rng_map(w8set):
        return {n: (8 if n in w8set else 4) for n in names}
    if all8:
        every = set(names)
        return {"19-15": rng_map(every), "14-10": rng_map(every),
                "9-5": rng_map(every), "4-0": rng_map(every),
                "fp_layers": []}
    outer = {n for n in names if ".qkv" in n or ".proj" in n} \
        if outer_w8 else set()
    return {"19-15": rng_map(outer), "14-10": rng_map(set()),
            "9-5": rng_map(set()), "4-0": rng_map(outer),
            "fp_layers": []}


def with_wbits(plan, bits):
    d = plan.default_layer
    return dataclasses.replace(plan, default_layer=dataclasses.replace(
        d, weight=dataclasses.replace(d.weight, n_bits=bits)))


def run_arm(name, plan, mp_w, plain=False):
    """plain=True: bypass the MP sampler — run the quant model through the
    plain sampler.sample scan (isolates MP machinery from quant numerics)."""
    res = plan.resolver()

    def model_ctor(r):
        kw = {} if r is None else {"resolver": r}
        return STDiT(input_size=latent, patch_size=(1, 2, 2),
                     scan_blocks=True, **NET, **kw)

    model_q = model_ctor(res)
    model_fp = model_ctor(None)
    init_args = (jnp.concatenate([z, z]), jnp.zeros((2,)), y, mask)
    variables = _build_variables(model_q, res, init_args, jax, jnp)
    fp_vars = {"params": variables["params"]}

    smooth = plan.default_layer.smooth_quant
    if smooth.enable:
        t_probes = [int((lo + hi) // 2) for lo, hi in smooth.timerange]

        @jax.jit
        def sq_stat(vs):
            q = vs["quant"]
            muts = None
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

    sampler = IDDPM(num_sampling_steps=n_steps, cfg_scale=4.0)

    @jax.jit
    def fp_denoise(vs, zz):
        return sampler.sample(lambda x, t, yy, mm, qctx:
                              model_fp.apply(vs, x, t, yy, mm),
                              zz, y, mask, sampler_type="ddim")

    if plain:
        from viditq_tpu.samplers.iddpm import default_qctx_factory
        qf = default_qctx_factory(mode="quant")

        @jax.jit
        def plain_run(vs, zz):
            return sampler.sample(
                lambda xx, tt, yy, mm, qctx: model_q.apply(
                    vs, xx, tt, yy, mm, qctx=qctx),
                zz, y, mask, sampler_type="ddim", qctx_factory=qf)
        mp_fn = lambda vs, zz, yy, mm: plain_run(vs, zz)
        mp_vars = variables
    else:
        mp_fn = build_mp_sampler(model_ctor, sampler, plan, mp_w, None)
        mp_vars = (mp_fn.prepare(variables, z, y, mask)
                   if hasattr(mp_fn, "prepare") else variables)
    jax.block_until_ready(mp_vars)
    out_fp = fp_denoise(fp_vars, z)
    out_q = mp_fn(mp_vars, z, y, mask)
    rel = float(jnp.linalg.norm((out_q - out_fp).astype(jnp.float32))
                / jnp.linalg.norm(out_fp.astype(jnp.float32)))
    print(json.dumps({"arm": name, "single_scan": hasattr(mp_fn, "n_ranges"),
                      "platform": jax.devices()[0].platform,
                      "scale_method": scale_method or "min_max",
                      "rel_err_vs_bf16": round(rel, 4)}), flush=True)


depth = NET["depth"]
arms = os.environ.get("VIDITQ_MATRIX_ARMS",
                      "naive-w4,mp-only,cb-only,full").split(",")
for a in arms:
    a = a.strip()
    if a == "naive-w4":
        run_arm(a, variant(base_plan, cb=False), mp_cfg(depth, False))
    elif a == "mp-only":
        run_arm(a, variant(base_plan, cb=False), mp_cfg(depth, True))
    elif a == "cb-only":
        run_arm(a, variant(base_plan, cb=True), mp_cfg(depth, False))
    elif a == "full":
        run_arm(a, variant(base_plan, cb=True), mp_cfg(depth, True))
    elif a == "mp-all8":
        run_arm(a, variant(base_plan, cb=False), mp_cfg(depth, True, all8=True))
    elif a == "naive-w8":
        run_arm(a, with_wbits(variant(base_plan, cb=False), 8),
                mp_cfg(depth, True, all8=True))
    elif a == "plain-w8":
        run_arm(a, with_wbits(variant(base_plan, cb=False), 8), None,
                plain=True)
    elif a == "plain-w4":
        run_arm(a, variant(base_plan, cb=False), None, plain=True)
