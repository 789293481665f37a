"""Timestep-wise mixed-precision quantized inference.

Reference: `t2v/scripts/quant_txt2video_mp.py:188-556` +
`gaussian_diffusion.py:740-767` — the reference flips quantizer bitwidths
*mutably inside the denoise loop*. TPU-native design: the sampler trajectory
is split into the config's step ranges and each range runs as its own jitted
scan whose per-layer bit assignment is static (baked into the resolver), so
XLA sees only constant quantization structure per segment.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from viditq_tpu.pipelines.analysis import mp_overrides_for_range, parse_mp_ranges
from viditq_tpu.samplers.iddpm import IDDPM, default_qctx_factory
from viditq_tpu.quant.spec import LayerQuantSpec


def _build_segments(model_ctor, sampler: IDDPM, plan,
                    mp_weight_cfg: Mapping,
                    mp_act_cfg: Optional[Mapping]):
    """Parse + validate the MP range configs and instantiate one model per
    step range (each with its bit allocation baked into a static resolver).
    Returns [(model, step_indices), ...] in sampling order."""
    base = plan.default_layer
    fp_extra = tuple(mp_weight_cfg.get("fp_layers", ()) or ())
    w_ranges = parse_mp_ranges(mp_weight_cfg)
    a_ranges = dict(
        (rng_key, layers)
        for (rng_key, layers) in parse_mp_ranges(mp_act_cfg or {}))

    n = sampler.schedule.n_steps
    # the weight ranges must TILE the sampler schedule: a gap would
    # silently skip denoising steps, an overlap would denoise them twice
    covered = []
    for (hi, lo), _ in w_ranges:
        covered.extend(range(min(hi, n - 1), lo - 1, -1))
    if sorted(covered, reverse=True) != list(range(n - 1, -1, -1)):
        raise ValueError(
            f"mixed-precision step ranges {[r for r, _ in w_ranges]} do "
            f"not tile the {n}-step sampler schedule (covered: "
            f"{sorted(set(covered), reverse=True)})")
    # act ranges are matched per weight range by exact (hi, lo) key
    stray = set(a_ranges) - {r for r, _ in w_ranges}
    if stray:
        raise ValueError(
            f"act mixed-precision ranges {sorted(stray)} have no matching "
            f"weight range — their bit overrides would be silently dropped")

    segments = []
    for (hi, lo), w_bits in w_ranges:
        a_bits = a_ranges.get((hi, lo))
        overrides = mp_overrides_for_range(w_bits, a_bits, base)

        def resolver(name, _ov=overrides):
            for pat, spec in _ov.items():
                from viditq_tpu.quant.naming import pattern_in
                if pattern_in(name, pat):
                    break
            else:
                spec = base
            from viditq_tpu.quant.naming import any_pattern_in
            extra = tuple(p[6:] if p.startswith("model.") else p
                          for p in fp_extra)
            if any_pattern_in(name, plan.fp_patterns + extra):
                return spec.disabled()
            return spec

        # sampler-step range hi..lo inclusive, descending (sampling order)
        step_indices = list(range(min(hi, n - 1), lo - 1, -1))
        segments.append((model_ctor(resolver), step_indices, resolver))
    return segments


def _mp_tspans(sampler: IDDPM, w_ranges):
    """MP sampler-step ranges -> contiguous original-timestep spans.

    Boundary between adjacent ranges = midpoint of the neighboring steps'
    original timesteps (schedule.timestep_map[i] is the original t of step
    i, ascending). Returns spans [(lo, hi)] ASCENDING in t, plus the
    per-span layer-bits dicts in the same order."""
    tmap = np.asarray(sampler.schedule.timestep_map)
    n = sampler.schedule.n_steps
    asc = sorted(w_ranges, key=lambda r: r[0][1])  # by lo step, ascending t
    spans, bits = [], []
    prev_hi_t = -1
    for (hi, lo), layer_bits in asc:
        hi = min(hi, n - 1)
        hi_t = 1000 if hi >= n - 1 else (int(tmap[hi]) + int(tmap[hi + 1])) // 2
        spans.append((prev_hi_t + 1, hi_t))
        bits.append(layer_bits)
        prev_hi_t = hi_t
    return spans, bits


def _union_partition(mp_spans, cb_spans):
    """Finest common refinement of two contiguous partitions of [0, 1000].
    Returns (spans ascending, mp_idx per span, cb_idx per span)."""
    cuts = sorted({hi for _, hi in mp_spans} | {hi for _, hi in cb_spans})
    spans, lo = [], 0
    for hi in cuts:
        spans.append((lo, hi))
        lo = hi + 1

    def idx_of(part, t):
        for i, (l, h) in enumerate(part):
            if l <= t <= h:
                return i
        raise ValueError(f"t={t} outside partition {part}")

    mp_idx = [idx_of(mp_spans, l) for l, _ in spans]
    cb_idx = [idx_of(cb_spans, l) for l, _ in spans]
    return spans, mp_idx, cb_idx


def _clean(name: str) -> str:
    return name[6:] if name.startswith("model.") else name


def build_mp_sampler_gather(model_ctor, sampler: IDDPM, plan,
                            mp_weight_cfg: Mapping,
                            mp_act_cfg: Optional[Mapping],
                            act_slot_map: Optional[np.ndarray] = None,
                            static_segments: bool = False):
    """Union-packed timestep-MP sampler (native backend).

    Instead of one jitted scan per step range with in-jit repacking
    (build_mp_sampler's segmented fallback — the reference's mutable
    per-step bit flip translated range-wise,
    gaussian_diffusion.py:740-767), this path packs EVERY range's
    per-layer bit allocation into the smooth-quant timerange axis: the
    union of the CB timeranges and the MP step ranges becomes the new
    timerange partition, and per-range int slabs are packed OFFLINE at
    that range's bits (int8 codes regardless of bit width). Two runtime
    strategies over the same packed variables:

    * gather (default): the WHOLE sampler is one compiled `lax.scan`;
      every layer gathers slab + effective scale/zp by a traced tr_id.
    * static_segments=True: one `denoise_range` scan per union span with
      the span's timerange id pinned as a compile-time constant
      (QuantCtx.tr_static) — every per-timerange gather constant-folds to
      a static slice, so the matmuls read the slabs in place. Costs one
      compiled program per span; zero dynamic indexing in steady state.

    Returns None when the configs aren't representable on this path (non-
    native backend, static/sub-8-bit acts, varying act bits, CB disabled,
    bits outside the calibrated mixed_precision list)."""
    base = plan.default_layer
    if not (plan.uses_native() and base.weight is not None
            and base.weight_quant and base.act_quant
            and base.act is not None and base.act.dynamic
            and base.act.n_bits == 8 and base.smooth_quant.enable
            and "momentum" in base.smooth_quant.channel_wise_scale_type):
        return None
    w_ranges = parse_mp_ranges(mp_weight_cfg)
    if not w_ranges:
        return None
    # same tiling validation as _build_segments: without it a gapped
    # config would silently absorb uncovered steps into the nearest
    # range's midpoint span, and a short top range would crash later in
    # _union_partition with an opaque 't outside partition' error
    n_steps = sampler.schedule.n_steps
    covered = []
    for (hi, lo), _ in w_ranges:
        covered.extend(range(min(hi, n_steps - 1), lo - 1, -1))
    if sorted(covered, reverse=True) != list(range(n_steps - 1, -1, -1)):
        raise ValueError(
            f"mixed-precision step ranges {[r for r, _ in w_ranges]} do "
            f"not tile the {n_steps}-step sampler schedule (covered: "
            f"{sorted(set(covered), reverse=True)})")
    for _, layer_bits in parse_mp_ranges(mp_act_cfg or {}):
        if any(b != base.act.n_bits for b in layer_bits.values()):
            return None  # varying act bits: segmented fallback
    avail = base.weight.bits_tuple
    for _, layer_bits in w_ranges:
        if any(b not in avail for b in layer_bits.values()):
            return None

    mp_spans, mp_bits_dicts = _mp_tspans(sampler, w_ranges)
    smooth = base.smooth_quant
    spans, mp_idx, cb_idx = _union_partition(mp_spans,
                                             list(smooth.timerange))
    new_smooth = dataclasses.replace(
        smooth, timerange=tuple(spans),
        alpha=tuple(smooth.alpha_for_range(ci) for ci in cb_idx))
    plan_u = dataclasses.replace(
        plan, default_layer=dataclasses.replace(base,
                                                smooth_quant=new_smooth))
    base_resolve = plan_u.resolver()
    range_bits = [{_clean(k): v for k, v in d.items()}
                  for d in mp_bits_dicts]
    fp_extra = tuple(_clean(p)
                     for p in (mp_weight_cfg.get("fp_layers", ()) or ()))

    from viditq_tpu.quant.naming import pattern_in

    def _bits_for(range_map, name, default):
        """Per-range bit lookup with the segmented path's glob semantics
        (quant_model.py:14-36): exact key first, then pattern match — so
        module-level entries ('blocks.5.attn') cover their leaf linears."""
        v = range_map.get(name)
        if v is not None:
            return v
        for pat, b in range_map.items():
            if pattern_in(name, pat):
                return b
        return default

    def _kind(name: str) -> str:
        # layer KIND = the dotted name with index/wildcard segments dropped
        # ('blocks.5.attn.qkv' -> 'blocks.attn.qkv')
        return ".".join(s for s in name.split(".")
                        if not (s.isdigit() or s == "*"
                                or (s.startswith("[") and s.endswith("]"))))

    # Under scan_blocks the w_mp slot structure is declared from block 0's
    # spec but packing resolves every block's own name — any kind
    # overridden in ANY block must carry mp_bits in EVERY block so the
    # stacked tables exist (contents then differ per block).
    kind_pats = {_kind(n) for d in range_bits for n in d}

    def resolver(name: str):
        spec = base_resolve(name)
        if spec is None:
            return None
        from viditq_tpu.quant.naming import any_pattern_in
        if fp_extra and any_pattern_in(name, fp_extra):
            return spec.disabled()
        if spec.weight is not None and spec.weight_quant:
            bits = tuple(_bits_for(range_bits[mi], name, spec.weight.n_bits)
                         for mi in mp_idx)
            kn = _kind(name)
            if (any(b != spec.weight.n_bits for b in bits)
                    or any(pattern_in(kn, kp) for kp in kind_pats)):
                spec = dataclasses.replace(
                    spec, weight=dataclasses.replace(spec.weight,
                                                     mp_bits=bits))
        return spec

    model = model_ctor(resolver)
    qf = default_qctx_factory(mode="quant", act_slot_map=act_slot_map)
    cb_idx_arr = jnp.asarray(cb_idx, jnp.int32)
    from viditq_tpu.quant.qlinear import QuantCtx
    from viditq_tpu.quant.calibrate import calibrate_weight_tables
    from viditq_tpu.quant.native_pack import pack_native_weights

    cache: Dict[str, object] = {}

    def _template(z, y, mask):
        if "tmpl" not in cache:
            x2 = jnp.concatenate([z, z], axis=0)
            t = jnp.zeros((x2.shape[0],), jnp.float32)
            cache["tmpl"] = jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0), x2, t, y, mask,
                                   qctx=QuantCtx(mode="fp")))
        return cache["tmpl"]

    # the per-span BIG slots: everything whose union-stacked form is
    # O(model weights) per timerange. All small per-tr tables (act_scale,
    # cb_scale, w_delta, ...) stay union-stacked through calibration and
    # are sliced afterwards.
    _BIG = ("w_int", "w_colsum", "w_mp_scale", "w_mp_zp")

    def _union_q(variables, tmpl, span_slots: bool):
        """Base-plan quant leaves -> union-template layout. With
        span_slots=True the BIG slots are declared with a length-1 tr axis
        (to be filled by pack_native_weights(tr_only=...)) so the full
        union stack never exists."""
        src_q = traverse_util.flatten_dict(dict(variables.get("quant", {})))
        new_q = {}
        for path, sd in traverse_util.flatten_dict(
                dict(tmpl.get("quant", {}))).items():
            leaf = path[-1]
            src = src_q.get(path)
            if span_slots and leaf in _BIG:
                ax = sd.ndim - _TR_AX_FROM_END[leaf]
                shape = list(sd.shape)
                shape[ax] = 1
                new_q[path] = jnp.zeros(tuple(shape), sd.dtype)
            elif leaf == "act_scale" and src is not None:
                new_q[path] = jnp.take(src, cb_idx_arr, axis=src.ndim - 2)
            elif src is not None and tuple(src.shape) == tuple(sd.shape):
                new_q[path] = src
            else:
                new_q[path] = jnp.zeros(sd.shape, sd.dtype)
        return traverse_util.unflatten_dict(new_q)

    def _assemble(variables, q):
        """Attach the caller's params (and one shared qstats zeros dict) to
        a jit-produced quant collection HOST-SIDE. Returning params from
        inside the jit would make XLA COPY the full bf16 weight set per
        call — with one call per union span that duplicated ~1.3GB x
        n_spans on the XL t20 arm and OOMed the 16GB v5e even after the
        slabs themselves went per-span."""
        tmpl = cache["tmpl"]
        out = {"params": variables["params"], "quant": q}
        if "qstats" in tmpl:
            if "qstats0" not in cache:
                cache["qstats0"] = jax.jit(lambda: jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype),
                    dict(tmpl["qstats"])))()
            out["qstats"] = cache["qstats0"]  # read-only in quant mode
        return out

    @jax.jit
    def adapt_q(variables):
        """Base-plan variables (CB timeranges) -> union-plan quant
        collection: gather act stats per union range, recalibrate weight
        tables, pack per-range slabs + effective MP dequant tables. Pure
        function of the inputs — run once offline, reuse across sampler
        calls."""
        tmpl = cache["tmpl"]
        params = variables["params"]
        q = _union_q(variables, tmpl, span_slots=False)
        q = calibrate_weight_tables(params, q, resolver)
        return pack_native_weights(params, q, resolver)

    def adapt(variables):
        return _assemble(variables, adapt_q(variables))

    n_tr_u = len(spans)
    frozen = new_smooth.frozen_tr0_weights
    # timerange-stacked quant leaves, tr axis counted from the END of the
    # shape so block-scanned stacks ([L, n_tr, ...]) and unrolled leaves
    # ([n_tr, ...]) both resolve: w_int [.., n_tr, rows, F], the per-tr
    # row tables [.., n_tr, 1, F], the channel tables [.., n_tr, C]
    _TR_AX_FROM_END = {"w_int": 3, "w_colsum": 3, "w_mp_scale": 3,
                       "w_mp_zp": 3, "act_scale": 2, "cb_scale": 2}

    def _slice_span(quant, si):
        """Pre-slice every timerange-stacked quant leaf to union span si
        (keepdims). Done at PREPARE time, outside the sampling scan: a
        tr-slab slice inside the scan body feeds the Pallas matmul custom
        call as a fresh [rows, F] buffer — an HBM copy of the layer's
        weights EVERY STEP (the round-4 'timestep-MP overhead mystery':
        +6.4 ms/block e2e on Latte, +75 ms/step on STDiT t20). Sliced
        offline, the in-module gather (tr_static pinned to 0) is a
        full-extent slice XLA folds into the operand read — zero
        steady-state copies. The slicing runs INSIDE adapt's jit so the
        stacked union arrays are jit-internal temporaries; persisting
        stacked + sliced doubled quant HBM and OOMed the XL t20 arm."""
        flat = traverse_util.flatten_dict(dict(quant))
        out = {}
        for path, v in flat.items():
            name = path[-1]
            ax = None
            if name in _TR_AX_FROM_END:
                ax = v.ndim - _TR_AX_FROM_END[name]
            elif name.startswith("cbshare__"):
                ax = v.ndim - 2
            elif name in ("w_delta", "w_zp") and not frozen:
                # corrected per-tr weight tables: [.., n_bitwidth, n_tr,
                # 1, F]. Under frozen_tr0_weights (the default) the module
                # reads index 0 = tr0 directly, so they must stay whole.
                ax = v.ndim - 3
            if (ax is not None and 0 <= ax < v.ndim
                    and v.shape[ax] == n_tr_u):
                v = jax.lax.slice_in_dim(v, si, si + 1, axis=ax)
            out[path] = v
        return traverse_util.unflatten_dict(out)

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def adapt_span_q(variables, si):
        """One union span's adapted quant collection, without ever
        materializing the union weight stack. BIG slots are declared with
        a length-1 tr axis and packed at tr_only=si; the small per-tr
        tables are calibrated union-whole (frozen-tr0 weight tables need
        timerange 0's CB fold regardless of si) and sliced at the end.
        Sequential per-span calls keep peak HBM at base + one span
        instead of base + stack + all slices (the queue-3 OOM)."""
        tmpl = cache["tmpl"]
        params = variables["params"]
        q = _union_q(variables, tmpl, span_slots=True)
        q = calibrate_weight_tables(params, q, resolver)
        q = pack_native_weights(params, q, resolver, tr_only=si)
        return _slice_span(q, si)  # BIG slots are already length-1: no-op

    def adapt_span(variables, si):
        return _assemble(variables, adapt_span_q(variables, si))

    @functools.partial(jax.jit, static_argnums=1)
    def slice_span_q(vs, si):
        return _slice_span(vs["quant"], si)

    def slice_spans(vs):
        return tuple({**vs, "quant": slice_span_q(vs, si)}
                     for si in range(n_tr_u))

    def prepare(variables, z, y, mask):
        if isinstance(variables, tuple):
            return variables  # already per-span prepared (static mode)
        tmpl = _template(z, y, mask)
        # already-adapted variables pass through (shapes match the union
        # template); base-plan variables are adapted once and memoized so
        # repeated run() calls don't re-pack the slabs
        src_q = variables.get("quant")
        matches = False
        if src_q is not None:
            flat_src = traverse_util.flatten_dict(dict(src_q))
            flat_tmp = traverse_util.flatten_dict(dict(tmpl["quant"]))
            matches = all(tuple(flat_src.get(p, jnp.zeros(())).shape)
                          == tuple(sd.shape) for p, sd in flat_tmp.items())
        if not static_segments:
            if matches:
                return variables
            # key on the object itself (held strongly), not id(): a freed
            # dict's id can be reused and would return stale packed slabs
            if cache.get("prep_src") is not variables:
                cache["prep_src"] = variables
                cache["prep_val"] = adapt(variables)
            return cache["prep_val"]
        if cache.get("prep_src") is not variables:
            cache["prep_src"] = variables
            cache["prep_val"] = (slice_spans(variables) if matches
                                 else tuple(adapt_span(variables, si)
                                            for si in range(n_tr_u)))
        return cache["prep_val"]

    if static_segments:
        # sampler step indices per union span, in SAMPLING order
        # (descending t). Every step's original timestep lands in exactly
        # one span because the spans partition [0, 1000].
        tmap = np.asarray(sampler.schedule.timestep_map)
        span_steps = []
        for si in range(len(spans) - 1, -1, -1):
            lo, hi = spans[si]
            idx = [i for i in range(len(tmap) - 1, -1, -1)
                   if lo <= int(tmap[i]) <= hi]
            if idx:
                span_steps.append((si, idx))

        @jax.jit
        def _sample(vs_spans, z, y, mask, rng=None):
            x2 = jnp.concatenate([z, z], axis=0)
            for si, idx in span_steps:
                # the span's variables are PRE-SLICED to its timerange
                # (prepare/_slice_span), so the pinned id is 0: the
                # in-module gather is a full-extent slice (a bitcast),
                # never a per-step slab copy
                vs = vs_spans[si]

                def qf_span(t_id, step_idx):
                    base_ctx = qf(t_id, step_idx)
                    return dataclasses.replace(base_ctx, tr_static=0)

                def model_apply(x, t, yy, mm, qctx, _vs=vs):
                    return model.apply(_vs, x, t, yy, mm, qctx=qctx)
                x2 = sampler.denoise_range(model_apply, x2, y, mask, idx,
                                           qctx_factory=qf_span, rng=rng)
            samples, _ = jnp.split(x2, 2, axis=0)
            return samples
    else:
        @jax.jit
        def _sample(vs, z, y, mask, rng=None):
            def model_apply(x, t, yy, mm, qctx):
                return model.apply(vs, x, t, yy, mm, qctx=qctx)
            return sampler.sample(model_apply, z, y, mask,
                                  sampler_type="ddim",
                                  qctx_factory=qf, rng=rng)

    def run(variables, z, y, mask, rng=None):
        vs = prepare(variables, z, y, mask)
        return _sample(vs, z, y, mask, rng=rng)

    run.prepare = prepare
    run.resolver = resolver
    run.n_ranges = len(spans)
    return run


def build_mp_sampler(model_ctor, sampler: IDDPM, plan,
                     mp_weight_cfg: Mapping,
                     mp_act_cfg: Optional[Mapping],
                     act_slot_map: Optional[np.ndarray] = None,
                     native_repack: Optional[bool] = None,
                     force_segmented: bool = False,
                     static_segments: Optional[bool] = None):
    """Build a reusable jitted MP sampler: fn(variables, z, y, mask, rng).

    The whole range chain traces ONCE into a single XLA computation (each
    range is its own `lax.scan` with its static bit layout); repeat calls
    hit the jit cache. Use this — not repeated `mp_quant_sample` calls —
    anywhere throughput matters: a fresh `mp_quant_sample` call re-traces
    every segment (pathological for unrolled-block models like Latte).

    Native CB plans with uniform 8-bit dynamic acts take the SINGLE-SCAN
    gather path (build_mp_sampler_gather): per-range slabs + effective
    dequant tables packed offline into the timerange axis, gathered by
    tr_id inside one compiled scan — no per-range programs, no in-jit
    repacking. `force_segmented=True` pins the segmented fallback (used by
    the parity tests and by configs the gather path can't represent).

    Segmented fallback: native_repack (default `plan.uses_native()`) — each
    range's int weight slabs are packed at ITS bit allocation inside the
    jit right before that range's scan, so slabs for identical allocations
    are CSE-deduped and dead slabs are freed between ranges. The input
    `variables["quant"]` must carry the native slots (calibrated + packed
    once at the plan's base bits)."""
    if not force_segmented:
        if static_segments is None:
            import os
            static_segments = os.environ.get(
                "VIDITQ_MP_STATIC_SEGMENTS", "1") == "1"
        run = build_mp_sampler_gather(model_ctor, sampler, plan,
                                      mp_weight_cfg, mp_act_cfg,
                                      act_slot_map=act_slot_map,
                                      static_segments=static_segments)
        if run is not None:
            return run
    segments = _build_segments(model_ctor, sampler, plan,
                               mp_weight_cfg, mp_act_cfg)
    qf = default_qctx_factory(mode="quant", act_slot_map=act_slot_map)
    if native_repack is None:
        native_repack = plan.uses_native()

    @jax.jit
    def run(variables, z, y, mask, rng=None):
        from viditq_tpu.quant.native_pack import pack_native_weights
        x2 = jnp.concatenate([z, z], axis=0)
        for model, step_indices, seg_resolver in segments:
            vs = variables
            if native_repack and "quant" in variables:
                q = pack_native_weights(variables["params"],
                                        variables["quant"], seg_resolver)
                vs = {**variables, "quant": q}

            def model_apply(x, t, yy, mm, qctx, _vs=vs, _m=model):
                return _m.apply(_vs, x, t, yy, mm, qctx=qctx)
            x2 = sampler.denoise_range(model_apply, x2, y, mask,
                                       step_indices, qctx_factory=qf,
                                       rng=rng)
        samples, _ = jnp.split(x2, 2, axis=0)
        return samples

    return run


def mp_quant_sample(model_ctor, variables, sampler: IDDPM, z, y, mask,
                    plan, mp_weight_cfg: Mapping, mp_act_cfg: Optional[Mapping],
                    act_slot_map: Optional[np.ndarray] = None,
                    rng=None):
    """Generate with per-step-range bit allocation (one-shot convenience).

    model_ctor(resolver) -> model module (same architecture, different
    static quant layout). mp_weight_cfg/mp_act_cfg: parsed bitwidth-config
    YAMLs ({'19-15': {layer: bits}, 'fp_layers': [...]}). For repeated
    generation, build once with `build_mp_sampler` and reuse."""
    run = build_mp_sampler(model_ctor, sampler, plan, mp_weight_cfg,
                           mp_act_cfg, act_slot_map=act_slot_map)
    return run(variables, z, y, mask, rng=rng)
