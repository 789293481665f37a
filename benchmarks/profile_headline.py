"""Profile the HEADLINE benchmark arms (STDiT-XL/2 16x512x512 ddim-20 CFG,
bf16 vs w8a8_tpu_fused_sm8) and print the top TPU ops by device time —
attributes the e2e-vs-block gap (block bisect says 1.29x, e2e 1.26x):
how much of a denoise step is outside the 28 scanned blocks (x/t/y
embedders, final layer, CFG plumbing, sampler update), and what the
in-block time splits into (fused matmuls, attention, producers).

Usage (TPU): python benchmarks/profile_headline.py {bf16|sm8} [top_n]

Build + compile + warmup run OUTSIDE the trace; the trace wraps exactly
one steady-state 20-step sampler call.
"""

import json
import sys
sys.path.insert(0, "/root/repo")
import tempfile
import time

import numpy as np


def build(arm):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viditq_tpu.models import STDiT_XL_2
    from viditq_tpu.quant import QuantCtx, calibrate_weight_tables
    from viditq_tpu.quant.native_pack import pack_native_weights
    from viditq_tpu.samplers import IDDPM
    from viditq_tpu.samplers.iddpm import default_qctx_factory
    from viditq_tpu.utils.config import load_quant_config

    latent = (16, 64, 64)
    n_steps = 20
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 4, *latent)) * 0.5, jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((2, 1, 120, 4096)) * 0.1,
                    jnp.bfloat16)
    mask = jnp.ones((1, 120), jnp.int32)

    plan = load_quant_config("configs/opensora/w8a8_tpu_fused_sm8.yaml")
    resolver = plan.resolver()
    model_q = STDiT_XL_2(input_size=latent, resolver=resolver,
                         scan_blocks=True)
    model_fp = STDiT_XL_2(input_size=latent, scan_blocks=True)
    sampler = IDDPM(num_sampling_steps=n_steps, cfg_scale=4.0)

    shapes = jax.eval_shape(
        lambda: model_q.init(jax.random.PRNGKey(0), jnp.concatenate([z, z]),
                             jnp.zeros((2,)), y, mask, QuantCtx(mode="fp")))

    @jax.jit
    def build_all(key):
        leaves, treedef = jax.tree.flatten(dict(shapes))
        keys = jax.random.split(key, len(leaves))
        vals = [(jax.random.normal(k, s.shape, s.dtype) * 0.02
                 if jnp.issubdtype(s.dtype, jnp.floating)
                 else jnp.zeros(s.shape, s.dtype))
                for k, s in zip(keys, leaves)]
        variables = jax.tree.unflatten(treedef, vals)
        quant = calibrate_weight_tables(variables["params"],
                                        variables["quant"], resolver)
        quant = pack_native_weights(variables["params"], quant, resolver)
        return variables["params"], quant

    params, quant = build_all(jax.random.PRNGKey(0))
    jax.block_until_ready(quant)
    qf = default_qctx_factory("quant")

    if arm == "bf16":
        vs = {"params": params}

        @jax.jit
        def denoise(vs, zz):
            return sampler.sample(
                lambda x, t, y_, m_, qctx: model_fp.apply(vs, x, t, y_, m_),
                zz, y, mask, sampler_type="ddim")
    else:
        vs = {"params": params, "quant": quant}

        @jax.jit
        def denoise(vs, zz):
            return sampler.sample(
                lambda x, t, y_, m_, qctx: model_q.apply(vs, x, t, y_, m_,
                                                         qctx),
                zz, y, mask, sampler_type="ddim", qctx_factory=qf)
    return denoise, vs, z, n_steps


def main(arm, top_n=50):
    import jax
    denoise, vs, z, n_steps = build(arm)
    t0 = time.time()
    denoise(vs, z).block_until_ready()
    print(f"{arm}: compiled in {time.time()-t0:.0f}s", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    denoise(vs, z).block_until_ready()
    wall_ms = (time.perf_counter() - t0) / n_steps * 1e3
    print(json.dumps({"arm": arm, "ms_per_step": round(wall_ms, 3)}),
          flush=True)

    logdir = tempfile.mkdtemp(prefix="viditq_prof_")
    print(f"logdir {logdir}", file=sys.stderr, flush=True)
    with jax.profiler.trace(logdir):
        denoise(vs, z).block_until_ready()

    from viditq_tpu.utils.xplane import top_ops
    rows = top_ops(logdir, n=int(top_n))
    total = sum(r["ms"] for r in rows)
    print(json.dumps({"arm": arm, "top_total_ms": round(total, 2),
                      "per_step_ms": round(total / n_steps, 3)}))
    for r in rows:
        print(json.dumps({"op": r["op"][:110], "ms": round(r["ms"], 3),
                          "count": r["count"]}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
