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


def mp_quant_sample(model_ctor, variables, sampler: IDDPM, z, y, mask,
                    plan, mp_weight_cfg: Mapping, mp_act_cfg: Optional[Mapping],
                    act_slot_map: Optional[np.ndarray] = None,
                    rng=None):
    """Generate with per-step-range bit allocation.

    model_ctor(resolver) -> model module (same architecture, different
    static quant layout). mp_weight_cfg/mp_act_cfg: parsed bitwidth-config
    YAMLs ({'19-15': {layer: bits}, 'fp_layers': [...]}).
    """
    base = plan.default_layer
    fp_extra = tuple(mp_weight_cfg.get("fp_layers", ()) or ())
    w_ranges = parse_mp_ranges(mp_weight_cfg)
    a_ranges = dict(
        (rng_key, layers)
        for (rng_key, layers) in parse_mp_ranges(mp_act_cfg or {}))

    x2 = jnp.concatenate([z, z], axis=0)
    n = sampler.schedule.n_steps
    qf = default_qctx_factory(mode="quant", act_slot_map=act_slot_map)

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

        model = model_ctor(resolver)

        def model_apply(x, t, yy, mm, qctx, _m=model):
            return _m.apply(variables, x, t, yy, mm, qctx=qctx)

        # sampler-step range hi..lo inclusive, descending (sampling order)
        step_indices = list(range(min(hi, n - 1), lo - 1, -1))
        x2 = sampler.denoise_range(model_apply, x2, y, mask, step_indices,
                                   qctx_factory=qf, rng=rng)

    samples, _ = jnp.split(x2, 2, axis=0)
    return samples
