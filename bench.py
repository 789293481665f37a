"""Headline benchmark: W8A8 STDiT-XL/2 denoise-forward speedup vs BF16.

Runs on the real TPU chip (BASELINE.json north star: W8A8 STDiT 16x512x512
on one v5e at >= 2.5x the BF16 denoise throughput). Prints exactly ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

Methodology note: the TPU is reached through a relay whose sync adds ~30ms
and which dedupes identical dispatches, so each timed iteration is chained
on the previous output and the final sync is a 4-byte scalar pull.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viditq_tpu.models import STDiT_XL_2
    from viditq_tpu.quant import QuantCtx, calibrate_weight_tables
    from viditq_tpu.quant.native_pack import add_native_slots, pack_native_weights
    from viditq_tpu.utils.config import load_quant_config

    B = 2                       # CFG pair (configs/quant/.../16x512x512.py)
    latent = (16, 64, 64)       # 16x512x512 video, VAE /8, patch (1,2,2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 4, *latent)) * 0.5, jnp.bfloat16)
    t = jnp.asarray([500.0] * B, jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, 1, 120, 4096)) * 0.1, jnp.bfloat16)
    mask = jnp.ones((B, 120), jnp.int32)

    plan = load_quant_config("configs/opensora/w8a8_dynamic.yaml")
    sim_resolver = plan.resolver()
    nat_resolver = plan.with_backend("native").resolver()

    # scan_blocks: one compiled block instead of 28 -> ~20x lower compile
    # time through the remote-compile tunnel; numerically equivalent for the
    # uniform W8A8 config (tests/test_scan_blocks.py)
    model_fp = STDiT_XL_2(input_size=latent, scan_blocks=True)
    model_q = STDiT_XL_2(input_size=latent, resolver=nat_resolver,
                         scan_blocks=True)

    # cheap deterministic params (timing is weight-value independent)
    shapes = jax.eval_shape(
        lambda: model_q.init(jax.random.PRNGKey(0), x, t, y, mask,
                             QuantCtx(mode="fp")))
    key = jax.random.PRNGKey(0)

    # ONE jitted program builds params + calibrated/packed quant tables —
    # eager per-leaf tensor creation through the device relay would take
    # minutes (each op is a round trip).
    @jax.jit
    def build_all():
        def materialize(s):
            return (jnp.full(s.shape, 0.01, s.dtype)
                    if s.dtype != jnp.int8 else jnp.zeros(s.shape, s.dtype))
        variables = jax.tree.map(materialize, dict(shapes))
        quant = calibrate_weight_tables(variables["params"],
                                        variables["quant"], nat_resolver)
        quant = pack_native_weights(variables["params"], quant, nat_resolver)
        return variables["params"], quant

    t0 = time.time()
    params, quant = build_all()
    jax.block_until_ready(quant)
    print(f"calibration done in {time.time()-t0:.0f}s", file=sys.stderr)
    variables = {"params": params, "quant": quant}
    fp_vars = {"params": params}

    qctx = QuantCtx(mode="quant", t_id=jnp.asarray(500, jnp.int32))

    @jax.jit
    def fp_step(vs, x):
        out = model_fp.apply(vs, x, t, y, mask)
        return out[:, :4].astype(jnp.bfloat16)  # chain latents

    @jax.jit
    def q_step(vs, x):
        out = model_q.apply(vs, x, t, y, mask, qctx)
        return out[:, :4].astype(jnp.bfloat16)

    def bench(f, vs, x0, tag, n_iter=12):
        t0 = time.time()
        xx = f(vs, x0)
        xx.block_until_ready()          # compile
        print(f"{tag}: compiled in {time.time()-t0:.0f}s", file=sys.stderr)
        float(jnp.sum(f(vs, xx)))       # full sync before timing
        t0 = time.time()
        for _ in range(n_iter):
            xx = f(vs, xx)
        float(jnp.sum(xx))              # scalar sync
        return (time.time() - t0) / n_iter

    t_fp = bench(fp_step, fp_vars, x, "bf16")
    t_q = bench(q_step, variables, x, "w8a8")
    speedup = t_fp / t_q
    result = {
        "metric": "stdit_xl2_16x512x512_w8a8_denoise_speedup_vs_bf16",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 2.5, 3),
        "detail": {
            "bf16_ms_per_fwd": round(t_fp * 1e3, 2),
            "w8a8_ms_per_fwd": round(t_q * 1e3, 2),
            "w8a8_denoise_steps_per_sec": round(1.0 / t_q, 3),
            "batch": B, "latent": list(latent),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
