"""Timestep-wise mixed-precision quantized inference.

Reference: `t2v/scripts/quant_txt2video_mp.py:188-556` +
`gaussian_diffusion.py:740-767` — the reference flips quantizer bitwidths
*mutably inside the denoise loop*. TPU-native design: the sampler trajectory
is split into the config's step ranges and each range runs as its own jitted
scan whose per-layer bit assignment is static (baked into the resolver), so
XLA sees only constant quantization structure per segment.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

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


def build_mp_sampler(model_ctor, sampler: IDDPM, plan,
                     mp_weight_cfg: Mapping,
                     mp_act_cfg: Optional[Mapping],
                     act_slot_map: Optional[np.ndarray] = None,
                     native_repack: Optional[bool] = None):
    """Build a reusable jitted MP sampler: fn(variables, z, y, mask, rng).

    The whole range chain traces ONCE into a single XLA computation (each
    range is its own `lax.scan` with its static bit layout); repeat calls
    hit the jit cache. Use this — not repeated `mp_quant_sample` calls —
    anywhere throughput matters: a fresh `mp_quant_sample` call re-traces
    every segment (pathological for unrolled-block models like Latte).

    native_repack (default: `plan.uses_native()`): on native-backend plans
    each range needs int weight slabs packed at ITS bit allocation — the
    repack runs inside the jit right before each range's scan, so slabs
    for identical allocations are CSE-deduped and dead slabs are freed
    between ranges. The input `variables["quant"]` must carry the native
    slots (calibrated + packed once at the plan's base bits)."""
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
