"""In-block backend bisection at STDiT-XL/2 shapes on the real block code.

Methodology (see BENCH_NOTES.md round-2 revision): per-iteration time is the
SLOPE between two chained fori_loop lengths inside single dispatches, with a
fresh input per run (the device relay dedupes identical dispatches) and a
scalar host readback (block_until_ready can return early through the relay).
This supersedes the round-1 per-dispatch timing that overstated overheads
and understated the int8 MXU rate (which is the full 2x: measured 384 TOPS
int8 vs 183 TFLOPS bf16 at 4096^3).

Usage: python benchmarks/block_bisect.py [arm ...]
"""

import dataclasses
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np


def main(arms):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viditq_tpu.models.stdit import STDiTBlock
    from viditq_tpu.quant import (
        LayerQuantSpec, QuantSpec, QuantCtx, calibrate_weight_tables,
        resolve_layer_spec)
    from viditq_tpu.quant.native_pack import add_native_slots, \
        pack_native_weights

    B, T, S, C = 2, 16, 1024, 1152
    N = T * S
    H = 16

    W8 = QuantSpec(n_bits=8, granularity="channel", channel_axis=-1,
                   round_mode="nearest")
    A8 = QuantSpec(n_bits=8, granularity="token", round_mode="nearest_ste",
                   dynamic=True)
    A8S = dataclasses.replace(A8, sym=True)

    def mk_resolver(default, overrides=None):
        def resolve(name):
            spec = default
            if overrides:
                for pat, sp in overrides.items():
                    if pat in name:
                        spec = sp
                        break
            return spec
        return resolve

    W8S = dataclasses.replace(W8, sym=True)
    NAT = LayerQuantSpec(weight=W8, act=A8, backend="native")
    NATS = dataclasses.replace(NAT, act=A8S)
    WO = dataclasses.replace(NAT, act=None, act_quant=False)
    FUSED = dataclasses.replace(NAT, impl="fused")
    FUSED_S = dataclasses.replace(NATS, impl="fused")
    FUSED_SS = dataclasses.replace(FUSED_S, weight=W8S)
    SM8 = QuantSpec(n_bits=8, granularity="tensor", always_zero=True,
                    dynamic=True)
    FUSED_ATTN8 = dataclasses.replace(FUSED_SS, attn_act=A8S, softmax=SM8)
    FUSED_PV8 = dataclasses.replace(FUSED_SS, softmax=SM8)
    ARMS = {
        "bf16": None,
        "int8-asym": mk_resolver(NAT),
        "int8-sym": mk_resolver(NATS),
        "hybrid": mk_resolver(WO, {"mlp": NAT}),
        "hybrid-sym": mk_resolver(WO, {"mlp": NATS}),
        "weight-only": mk_resolver(WO),
        "int8-sym-mlp-attn": mk_resolver(WO, {"mlp": NATS, "attn": NATS}),
        "fused-asym": mk_resolver(FUSED),
        "fused-sym": mk_resolver(FUSED_S),
        "fused-allsym": mk_resolver(FUSED_SS),
        "fused-pv8": mk_resolver(FUSED_PV8),
        "fused-attn8": mk_resolver(FUSED_ATTN8),
        # softmax int8 PV scoped to the sites where it measured a win
        # (temporal + cross; spatial stays bf16) — w8a8_tpu_fused_sm8.yaml
        "fused-sm8-scoped": mk_resolver(
            FUSED_SS, {"attn_temp": FUSED_PV8, "cross_attn": FUSED_PV8}),
        # static per-tensor act tables (reference w8a8_naive semantics):
        # quantize is a pure XLA elementwise pass fused into producers;
        # matmuls run the Pallas consumer kernel. TIMING arm (tables are
        # left uncalibrated here).
        "static-allsym": mk_resolver(dataclasses.replace(
            FUSED_SS, act=QuantSpec(n_bits=8, granularity="tensor",
                                    sym=True, dynamic=False))),
        "static-allsym-sm8": mk_resolver(
            dataclasses.replace(
                FUSED_SS, act=QuantSpec(n_bits=8, granularity="tensor",
                                        sym=True, dynamic=False)),
            {"attn_temp": dataclasses.replace(
                FUSED_PV8, act=QuantSpec(n_bits=8, granularity="tensor",
                                         sym=True, dynamic=False)),
             "cross_attn": dataclasses.replace(
                FUSED_PV8, act=QuantSpec(n_bits=8, granularity="tensor",
                                         sym=True, dynamic=False))}),
    }
    # CB / timestep-MP cost decomposition (round-4: the CB arms — sigma1024,
    # w4a8-full, t20mp — all sit ~0.2x below the non-CB fused arms; these
    # same-run arms isolate what CB machinery costs inside one block):
    #   fused-cb     CB gather + fold_cs in-kernel quantize, W8
    #   fused-cb-w4  same at W4 slabs (bit-width timing control)
    #   fused-cb-mp  CB + per-range w_mp table gather (qkv/proj mp_bits)
    from viditq_tpu.quant.spec import SmoothQuantSpec
    SQ = SmoothQuantSpec(enable=True,
                         channel_wise_scale_type="momentum_act_max",
                         alpha=(0.11, 0.11),
                         timerange=((0, 500), (501, 1000)))
    W48 = dataclasses.replace(W8, mixed_precision=(4, 8))
    W48_4 = dataclasses.replace(W48, n_bits=4)
    FUSED_CB = dataclasses.replace(FUSED, weight=W48, smooth_quant=SQ)
    FUSED_CB4 = dataclasses.replace(FUSED_CB, weight=W48_4)
    MPW = dataclasses.replace(W48_4, mp_bits=(8, 4))
    FUSED_CB_MP = dataclasses.replace(FUSED_CB4, weight=MPW)
    ARMS["fused-cb"] = mk_resolver(FUSED_CB)
    ARMS["fused-cb-w4"] = mk_resolver(FUSED_CB4)
    ARMS["fused-cb-mp"] = mk_resolver(
        FUSED_CB4, {"attn.q": FUSED_CB_MP, "attn.k": FUSED_CB_MP,
                    "attn.v": FUSED_CB_MP, "proj": FUSED_CB_MP})
    # qkv_share_cs: pooled q/k/v balancing scale -> producer + shared
    # prequant re-engage under CB (cs folds into the adaLN modulate /
    # the shared quantize's col_scale)
    SQ_SHARE = dataclasses.replace(SQ, qkv_share_cs=True)
    ARMS["fused-cb-share"] = mk_resolver(
        dataclasses.replace(FUSED_CB, smooth_quant=SQ_SHARE))
    ARMS["fused-cb-share-w4"] = mk_resolver(
        dataclasses.replace(FUSED_CB4, smooth_quant=SQ_SHARE))
    # MP-cost isolation (round-4: cb-mp measured +1.4 ms/block over
    # cb-share-w4): -same44 keeps the w_mp gather machinery but with
    # IDENTICAL bits per range (isolates machinery cost from content);
    # -share adds the pooled qkv cs on top of mp
    MPW44 = dataclasses.replace(W48_4, mp_bits=(4, 4))
    FUSED_CB_MP44 = dataclasses.replace(FUSED_CB4, weight=MPW44)
    ARMS["fused-cb-mp-same44"] = mk_resolver(
        FUSED_CB4, {"attn.q": FUSED_CB_MP44, "attn.k": FUSED_CB_MP44,
                    "attn.v": FUSED_CB_MP44, "proj": FUSED_CB_MP44})
    FUSED_CB_MP_SH = dataclasses.replace(
        FUSED_CB_MP, smooth_quant=SQ_SHARE)
    ARMS["fused-cb-share-mp"] = mk_resolver(
        dataclasses.replace(FUSED_CB4, smooth_quant=SQ_SHARE),
        {"attn.q": FUSED_CB_MP_SH, "attn.k": FUSED_CB_MP_SH,
         "attn.v": FUSED_CB_MP_SH, "proj": FUSED_CB_MP_SH})
    arms = arms or list(ARMS)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)) * 0.5, jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((B, 120, C)) * 0.5, jnp.bfloat16)
    t0 = jnp.asarray(rng.standard_normal((B, 6 * C)) * 0.1, jnp.bfloat16)

    def _force(out):
        return float(jnp.sum(out[..., :1, :1].astype(jnp.float32)))

    results = {}
    for arm in arms:
        resolver = ARMS[arm]
        block = STDiTBlock(hidden_size=C, num_heads=H, d_s=S, d_t=T,
                           resolver=resolver or (lambda n: None),
                           prefix="b", dtype=jnp.bfloat16)
        qctx = QuantCtx(mode="quant") if resolver else None
        variables = block.init(jax.random.PRNGKey(0), x, y, t0,
                               qctx=QuantCtx(mode="fp") if resolver else None)
        variables = dict(variables)
        if resolver and "quant" in variables:
            smooth_on = (resolver("b.mlp.fc1") is not None
                         and resolver("b.mlp.fc1").smooth_quant.enable)
            if smooth_on:
                # CB arms: fill per-timerange act stats before calibration
                for t_id in (100, 900):
                    _, muts = block.apply(
                        variables, x, y, t0,
                        qctx=QuantCtx(mode="sq_stat",
                                      t_id=jnp.asarray(t_id, jnp.int32)),
                        mutable=["quant", "qstats"])
                    variables["quant"] = muts["quant"]
                    variables["qstats"] = muts["qstats"]
            variables["quant"] = calibrate_weight_tables(
                variables["params"], variables["quant"], resolver)
            variables["quant"] = add_native_slots(
                variables["quant"], variables["params"], resolver)
            variables["quant"] = pack_native_weights(
                variables["params"], variables["quant"], resolver)

        # VIDITQ_BISECT_TRACED_T=1: t_id varies per loop iteration (a
        # TRACED value, like the real sampler scan) instead of the static
        # default — exercises the per-step timerange slab/table gathers
        # that constant-fold away under a static t_id (round-4: the
        # gather-MP e2e arms pay ~75 ms/step the static bisect never saw)
        import os
        traced_t = os.environ.get("VIDITQ_BISECT_TRACED_T") == "1"

        def mk(iters):
            @jax.jit
            def f(x, vs):
                def body(i, x):
                    qc = qctx
                    if qctx is not None and traced_t:
                        qc = QuantCtx(mode="quant",
                                      t_id=(i * 97) % 1000)
                    return block.apply(vs, x, y, t0, qctx=qc
                                       ).astype(x.dtype) * 0.5
                return jax.lax.fori_loop(0, iters, body, x)
            return f

        def t(fn, salt):
            _force(fn(x + salt, variables))
            best = 1e9
            for i in range(3):
                tt = time.perf_counter()
                _force(fn(x + salt + i + 1, variables))
                best = min(best, time.perf_counter() - tt)
            return best

        lo_i, hi_i = 4, 16
        f_lo, f_hi = mk(lo_i), mk(hi_i)
        per = (t(f_hi, 50.0) - t(f_lo, 10.0)) / (hi_i - lo_i)
        results[arm] = per * 1e3
        print(f"{arm:24s} {per*1e3:8.3f} ms/block", flush=True)
    if "bf16" in results:
        for k, v in results.items():
            if k != "bf16":
                print(f"{k:24s} speedup {results['bf16']/v:.3f}x")


if __name__ == "__main__":
    main(sys.argv[1:])
