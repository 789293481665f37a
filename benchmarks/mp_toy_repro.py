"""Minimal repro of the gather-MP e2e overhead (round-4).

e2e: Latte mp = 241 ms/step vs cb = 63 (+6.4 ms/block); STDiT t20mp =
428 vs ~353 plain (+2.7 ms/block). Block-level bisects (even traced-t)
show only +0.3..1.1 ms/block, and the isolated gather+matmul probe runs at
80% MXU efficiency — so the cost hides in the INTERACTION of the union-MP
spec (n_tr=5, mp_bits, unpacked slabs) with the real scan. This toy is a
stack of real QuantLinears (Latte/STDiT sizes) inside a 20-step
lax.scan with per-step traced t_id — attention/producers excluded.

Arms:
  cb       n_tr=2 CB spec, W4 slabs (the latte cb arm's qlinear config)
  union    n_tr=5 union spec WITHOUT mp_bits (isolates the n_tr width)
  mp       n_tr=5 union spec + mp_bits (the gather-MP qlinear config)
  mp-noact union + mp_bits, but act_scale/cb tables sliced at tr 0
           (static) — isolates the act-side gathers from the w side
           (implemented by frozen smooth timerange: single span)

Run on TPU: python benchmarks/mp_toy_repro.py [arm ...]
"""

import dataclasses
import json
import sys
sys.path.insert(0, "/root/repo")
import time

import flax.linen as nn
import numpy as np


def main(arms):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viditq_tpu.quant import (LayerQuantSpec, QuantSpec, QuantCtx,
                                  calibrate_weight_tables)
    from viditq_tpu.quant.qlinear import QuantLinear
    from viditq_tpu.quant.spec import SmoothQuantSpec
    from viditq_tpu.quant.native_pack import (add_native_slots,
                                              pack_native_weights)

    C = 1152
    B, N = 2, 4096
    LAYERS = [(C, C)] * 4 + [(C, 4 * C), (4 * C, C)]
    NBLK = 4  # 4 toy "blocks" of 6 linears = 24 linears

    W = QuantSpec(n_bits=4, granularity="channel", channel_axis=-1,
                  round_mode="nearest", sym=True,
                  mixed_precision=(4, 6, 8))
    A = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
                  dynamic=True, sym=True)
    SQ2 = SmoothQuantSpec(enable=True,
                          channel_wise_scale_type="momentum_act_max",
                          alpha=(0.11, 0.11),
                          timerange=((0, 500), (501, 1000)))
    SPANS5 = ((0, 236), (237, 499), (500, 500), (501, 762), (763, 1000))
    SQ5 = dataclasses.replace(SQ2, timerange=SPANS5,
                              alpha=(0.11,) * 5)
    BASE = LayerQuantSpec(weight=W, act=A, backend="native", impl="fused")
    CB2 = dataclasses.replace(BASE, smooth_quant=SQ2)
    CB5 = dataclasses.replace(BASE, smooth_quant=SQ5)
    MP_A = dataclasses.replace(          # attn-like: (8,4,4,4,8)
        CB5, weight=dataclasses.replace(W, mp_bits=(8, 4, 4, 4, 8)))
    MP_M = dataclasses.replace(          # mlp-like: all-8
        CB5, weight=dataclasses.replace(W, mp_bits=(8, 8, 8, 8, 8)))

    def res_of(spec_a, spec_m):
        def res(name):
            return spec_m if "fc" in name else spec_a
        return res

    ARM_SPECS = {
        "cb": res_of(CB2, CB2),
        "union": res_of(CB5, CB5),
        "mp": res_of(MP_A, MP_M),
    }

    class Stack(nn.Module):
        resolver: object

        @nn.compact
        def __call__(self, x, qctx=None):
            for b in range(NBLK):
                for li, (k, n) in enumerate(LAYERS):
                    nm = (f"b{b}.fc{li}" if n != k or li >= 4
                          else f"b{b}.l{li}")
                    x0 = x
                    x = QuantLinear(n, lspec=self.resolver(nm),
                                    name=nm.replace(".", "_"),
                                    dtype=jnp.bfloat16)(x, qctx)
                    if x.shape[-1] == x0.shape[-1]:
                        x = x + x0          # keep magnitudes sane
                    x = x * 0.5
            return x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)) * 0.5, jnp.bfloat16)
    # ddim-20 style descending t map
    tmap = jnp.asarray(np.linspace(975, 25, 20).astype(np.int32))

    for arm in (arms or list(ARM_SPECS)):
        res = ARM_SPECS[arm]
        model = Stack(resolver=res)
        t0 = time.time()
        variables = dict(model.init(jax.random.PRNGKey(0), x,
                                    qctx=QuantCtx(mode="fp")))
        # sq stats at one probe per timerange midpoint
        spans = res("b0.l0").smooth_quant.timerange
        for lo, hi in spans:
            _, muts = model.apply(
                variables, x,
                qctx=QuantCtx(mode="sq_stat",
                              t_id=jnp.asarray((lo + hi) // 2, jnp.int32)),
                mutable=["quant", "qstats"])
            variables["quant"] = muts["quant"]
            variables["qstats"] = muts["qstats"]
        variables["quant"] = calibrate_weight_tables(
            variables["params"], variables["quant"], res)
        variables["quant"] = add_native_slots(
            variables["quant"], variables["params"], res)
        variables["quant"] = pack_native_weights(
            variables["params"], variables["quant"], res)
        jax.block_until_ready(variables["quant"])

        @jax.jit
        def scan20(vs, x):
            def body(c, t_id):
                o = model.apply(vs, c, qctx=QuantCtx(mode="quant",
                                                     t_id=t_id))
                return (o * 0.1 + c * 0.9).astype(c.dtype), ()
            c, _ = jax.lax.scan(body, x, tmap)
            return c

        scan20(variables, x).block_until_ready()
        built = time.time() - t0
        ts = []
        for i in range(3):
            t1 = time.perf_counter()
            scan20(variables, x + 0.001 * i).block_until_ready()
            ts.append(time.perf_counter() - t1)
        per_step = min(ts) / 20 * 1e3
        print(json.dumps({"arm": arm, "ms_per_step": round(per_step, 3),
                          "ms_per_24linears": round(per_step, 3),
                          "build_s": round(built, 1)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
