"""Latte MP arm cost decomposition (round-4: the arm measures 0.53x while
STDiT w4a8-full gets 1.04x — find which machinery loses it at Latte's
small shapes). Same-run arms, e2e ddim-20 CFG sampling at 16x256x256:

  bf16        no quant
  fused       plain fused-native W8A8 sym (no CB, no MP) — the base quant
              win available at Latte shapes
  cb          the w4a8_timestep_aware_cb plan as-is (CB W4, no MP)
  cbshare     same + qkv_share_cs (pooled balancing scale)
  mp          cb + t20-style 4-range MP via the single-scan gather sampler
  mpshare     mp + qkv_share_cs

Run on TPU: python benchmarks/latte_decomp.py [arm ...]
"""

import dataclasses
import json
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np


def setup():
    """Build the arm registry once; returns (ARMS, z, n_steps). Split out
    of main so profile_arm.py can compile an arm OUTSIDE a profiler trace
    and trace only the steady-state call (a whole-main trace exceeds the
    2GB XSpace protobuf cap)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viditq_tpu.models import Latte_XL_2
    from viditq_tpu.pipelines.mixed_precision import build_mp_sampler
    from viditq_tpu.quant import QuantCtx, calibrate_weight_tables
    from viditq_tpu.samplers import IDDPM
    from viditq_tpu.utils.config import load_quant_config
    from benchmarks.bench_configs import _build_variables

    import os
    latent = tuple(int(s) for s in os.environ.get(
        "VIDITQ_LATTE_LATENT", "16,32,32").split(","))
    n_steps = 20
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 4, *latent)) * 0.5, jnp.bfloat16)
    y_c = jnp.asarray(rng.standard_normal((1, 1, 1, 4096)) * 0.1,
                      jnp.bfloat16)
    y = jnp.concatenate([y_c, y_c * 0], axis=0)
    mask = None

    def model_ctor_for(res):
        def ctor(r):
            kw = {} if r is None else {"resolver": r}
            return Latte_XL_2(input_size=latent, condition="text",
                              caption_channels=4096, **kw)
        return ctor(res)

    plan_cb = load_quant_config(
        "configs/opensora/w4a8_timestep_aware_cb.yaml").with_backend("fused")
    plan_fused = load_quant_config("configs/opensora/w8a8_tpu_fused_sym.yaml")

    def share(plan):
        d = plan.default_layer
        return dataclasses.replace(plan, default_layer=dataclasses.replace(
            d, smooth_quant=dataclasses.replace(d.smooth_quant,
                                                qkv_share_cs=True)))

    sampler = IDDPM(num_sampling_steps=n_steps, cfg_scale=4.0)

    names_a = [f"blocks.{i}.attn" for i in range(28)]
    names_m = [f"blocks.{i}.mlp" for i in range(28)]
    mp_w = {"fp_layers": []}
    for rng_key, attn_bits in (("19-15", 8), ("14-10", 4), ("9-5", 4),
                               ("4-0", 8)):
        mp_w[rng_key] = {**{n: attn_bits for n in names_a},
                         **{n: 8 for n in names_m}}

    def calibrated(model, res, plan):
        init_args = (z, jnp.zeros((1,)), y[:1])
        variables = _build_variables(model, res, init_args, jax, jnp)
        if not plan.default_layer.smooth_quant.enable:
            return variables
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
        return variables

    from viditq_tpu.samplers.iddpm import default_qctx_factory
    qf = default_qctx_factory("quant")

    def plain_sampler(plan):
        res = plan.resolver()
        model = model_ctor_for(res)
        variables = calibrated(model, res, plan)

        @jax.jit
        def denoise(vs, z):
            def apply(x, t, yy, mm, qctx):
                return model.apply(vs, x, t, yy, qctx=qctx)
            return sampler.sample(apply, z, y, mask, sampler_type="ddim",
                                  qctx_factory=qf)
        return lambda zz: denoise(variables, zz)

    def mp_sampler(plan):
        res = plan.resolver()
        model = model_ctor_for(res)
        variables = calibrated(model, res, plan)

        def ctor(r):
            kw = {} if r is None else {"resolver": r}
            return Latte_XL_2(input_size=latent, condition="text",
                              caption_channels=4096, **kw)
        fn = build_mp_sampler(ctor, sampler, plan, mp_w, None)
        mp_vars = (fn.prepare(variables, z, y, mask)
                   if hasattr(fn, "prepare") else variables)
        jax.block_until_ready(mp_vars)
        return lambda zz: fn(mp_vars, zz, y, mask)

    def fp_sampler():
        model = model_ctor_for(None)
        res = plan_fused.resolver()
        model_q = model_ctor_for(res)
        init_args = (z, jnp.zeros((1,)), y[:1])
        variables = _build_variables(model_q, res, init_args, jax, jnp)
        vs = {"params": variables["params"]}

        @jax.jit
        def denoise(vs, z):
            return sampler.sample(lambda x, t, yy, mm, qctx:
                                  model.apply(vs, x, t, yy),
                                  z, y, mask, sampler_type="ddim")
        return lambda zz: denoise(vs, zz)

    ARMS = {
        "bf16": fp_sampler,
        "fused": lambda: plain_sampler(plan_fused),
        "cb": lambda: plain_sampler(plan_cb),
        "cbshare": lambda: plain_sampler(share(plan_cb)),
        "mp": lambda: mp_sampler(plan_cb),
        "mpshare": lambda: mp_sampler(share(plan_cb)),
    }
    return ARMS, z, n_steps


def main(arms):
    import jax
    ARMS, z, n_steps = setup()
    arms = arms or list(ARMS)
    results = {}
    for name in arms:
        t0 = time.time()
        f = ARMS[name]()
        f(z).block_until_ready()
        print(f"{name}: built+compiled in {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            f(z).block_until_ready()
            ts.append(time.perf_counter() - t0)
        results[name] = min(ts) / n_steps * 1e3
        print(json.dumps({"arm": name,
                          "ms_per_step": round(results[name], 3)}),
              flush=True)
    if "bf16" in results:
        for k, v in results.items():
            if k != "bf16":
                print(json.dumps({"arm": k, "speedup":
                                  round(results["bf16"] / v, 3)}),
                      flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
