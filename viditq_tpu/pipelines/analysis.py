"""Offline quantization-analysis tooling.

Covers the reference's analysis scripts as library functions:
  * sensitivity        — `t2v/scripts/get_sensitivity.py` (772 LoC): quantize
    one {layer | group | timestep-window x group} at a time, generate, score.
    The reference only writes videos for an external metric harness; we also
    compute frame-MSE vs the FP output directly (the metric its
    analysis_tools/mixed_precision/metric.ipynb cell 2 computes offline).
  * sweep_alpha        — `t2v/scripts/sweep_alpha.py`: per-layer best
    smooth-quant alpha over a grid via layer-output MSE on captured inputs.
  * smooth_quant_list  — `t2v/scripts/get_smooth_quant_list.py`: pick CB
    layers by activation/weight channel-range ratios.
  * ptqd               — `t2v/scripts/calibrate_ptqd_k.py`: correlated-noise
    coefficient k_t from quant-vs-FP trajectories. Unlike the reference
    (which unconditionally applies its k file at inference,
    iddpm/__init__.py:168-174 — a known landmine) the correction here is
    opt-in via `apply_ptqd_correction`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from viditq_tpu.quant import core
from viditq_tpu.quant.calibrate import path_to_dotted
from viditq_tpu.quant.naming import pattern_in
from viditq_tpu.quant.qlinear import QuantCtx
from viditq_tpu.quant.spec import LayerQuantSpec

# reference group taxonomy (get_sensitivity.py:133-134)
QUANT_GROUPS = ("attn", "cross_attn", "mlp", "attn_temp")
KEEP_FP_GROUPS = ("embedder", "final", "t_block")


def single_target_resolver(base: LayerQuantSpec, target_pattern: str,
                           fp_patterns: Sequence[str] = ()):
    """Resolver that quantizes ONLY layers matching `target_pattern`
    (reference set_layer_quant / group_set_quant, quant_model.py:433-490)."""
    def resolve(name: str) -> Optional[LayerQuantSpec]:
        if pattern_in(name, target_pattern) and not any(
                pattern_in(name, p) for p in fp_patterns):
            return base
        return base.disabled()
    return resolve


def partial_quant_resolver(base: LayerQuantSpec, layer_names: Sequence[str],
                           quant_ratio: float, seed: int = 0,
                           fp_patterns: Sequence[str] = ()):
    """Quantize a random fraction of layers (reference `--part_quant /
    --quant_ratio` flags, config_utils.py:11-178)."""
    rng = np.random.default_rng(seed)
    eligible = [n for n in layer_names
                if not any(pattern_in(n, p) for p in fp_patterns)]
    k = int(round(len(eligible) * quant_ratio))
    chosen = set(rng.choice(eligible, size=k, replace=False)) if k else set()

    def resolve(name: str) -> Optional[LayerQuantSpec]:
        if name in chosen:
            return base
        return base.disabled()
    return resolve


def quantize_until_resolver(base: LayerQuantSpec,
                            ordered_names: Sequence[str], k: int,
                            fp_patterns: Sequence[str] = ()):
    """Quantize only the first k layers in forward order (reference
    `quantize_model_till`, qdiff/utils.py:588 — error-bisection debugging)."""
    chosen = set(ordered_names[:k])

    def resolve(name: str) -> Optional[LayerQuantSpec]:
        if name in chosen and not any(pattern_in(name, p)
                                      for p in fp_patterns):
            return base
        return base.disabled()
    return resolve


def frame_mse(a: jnp.ndarray, b: jnp.ndarray) -> float:
    """MSE between generations (metric.ipynb cell 2 semantics)."""
    return float(jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2))


def sensitivity_scan(run_with_resolver: Callable, base: LayerQuantSpec,
                     targets: Sequence[str],
                     fp_patterns: Sequence[str] = (),
                     fp_reference: Optional[jnp.ndarray] = None,
                     metric_fn: Callable = frame_mse) -> Dict[str, float]:
    """For each target pattern, generate with only that target quantized and
    score `metric_fn(out, fp_reference)` (default frame-MSE; pass a
    utils.metrics.make_sensitivity_metric('clip', ...) for the
    metric-decoupled perceptual ranking).

    run_with_resolver(resolver) -> generated sample array. The caller closes
    over model/sampler/inputs (see tests / scripts).
    """
    if fp_reference is None:
        fp_reference = run_with_resolver(lambda name: None)
    scores = {}
    for tgt in targets:
        res = single_target_resolver(base, tgt, fp_patterns)
        out = run_with_resolver(res)
        scores[tgt] = float(metric_fn(out, fp_reference))
    return scores


def sensitivity_scan_multi(run_with_resolver: Callable,
                           base: LayerQuantSpec,
                           targets: Sequence[str],
                           metric_fns: Mapping[str, Callable],
                           fp_patterns: Sequence[str] = (),
                           fp_reference: Optional[jnp.ndarray] = None
                           ) -> Dict[str, Dict[str, float]]:
    """sensitivity_scan scored under SEVERAL metrics from one generation
    per target — the reference computes its clip/clip_temp/flow sensitivity
    vectors as separate offline passes over saved videos
    (qdiff/analysis_tools/mixed_precision/sensitivity/*); here each
    target's sample is generated once and every metric scores it.

    Returns {metric_name: {target: score}} — feed through
    combine_sensitivity (+ generate_mp_config) to close the
    metric-decoupled MP loop."""
    if fp_reference is None:
        fp_reference = run_with_resolver(lambda name: None)
    scores: Dict[str, Dict[str, float]] = {m: {} for m in metric_fns}
    for tgt in targets:
        res = single_target_resolver(base, tgt, fp_patterns)
        out = run_with_resolver(res)
        for m, fn in metric_fns.items():
            scores[m][tgt] = float(fn(out, fp_reference))
    return scores


def combine_sensitivity(metric_vectors: Mapping[str, Mapping[str, float]],
                        weights: Optional[Mapping[str, float]] = None
                        ) -> Dict[str, float]:
    """Merge per-metric sensitivity vectors into one ranking (the role of
    the reference's metric.ipynb combination cell over its clip/flow/vqa
    vectors). Each metric's scores are rank-normalized to [0, 1] (scale-
    free — frame-MSE and CLIP-degradation units are incommensurate), then
    weighted-averaged per layer. Missing layers score 0 for that metric."""
    layers = sorted({n for v in metric_vectors.values() for n in v})
    if not layers:
        return {}
    w = {m: 1.0 for m in metric_vectors} if weights is None else dict(weights)
    total_w = sum(w.get(m, 0.0) for m in metric_vectors) or 1.0
    combined = {n: 0.0 for n in layers}
    for m, vec in metric_vectors.items():
        ranked = sorted(vec, key=lambda n: vec[n])
        denom = max(len(ranked) - 1, 1)
        rank01 = {n: i / denom for i, n in enumerate(ranked)}
        for n in layers:
            combined[n] += w.get(m, 0.0) * rank01.get(n, 0.0)
    return {n: s / total_w for n, s in combined.items()}


def _segmented_sample(sampler, fp_apply, q_apply, z, y, mask, hi, lo,
                      qctx_factory):
    """One generation that runs q_apply inside spaced-step window [lo, hi]
    and fp_apply outside it (the reference's mid-loop quant-state flips,
    gaussian_diffusion.py:691-738, as segmented scans)."""
    import jax.numpy as jnp
    n = sampler.schedule.n_steps
    x2 = jnp.concatenate([z, z], axis=0)
    if hi < n - 1:
        x2 = sampler.denoise_range(fp_apply, x2, y, mask,
                                   list(range(n - 1, hi, -1)))
    x2 = sampler.denoise_range(q_apply, x2, y, mask,
                               list(range(hi, lo - 1, -1)),
                               qctx_factory=qctx_factory)
    if lo > 0:
        x2 = sampler.denoise_range(fp_apply, x2, y, mask,
                                   list(range(lo - 1, -1, -1)))
    return jnp.split(x2, 2, axis=0)[0]


def timestep_window_sensitivity(sampler, fp_apply, q_apply, z, y, mask,
                                windows, qctx_factory,
                                fp_reference=None,
                                metric_fn: Callable = frame_mse
                                ) -> Dict[str, float]:
    """Per-timestep-window sensitivity: quantized inside the window, FP
    outside (reference timestep_wise_quant windows,
    gaussian_diffusion.py:691-738) — via segmented denoise ranges.

    windows: [(hi_step, lo_step)] over sampler steps, descending.
    """
    if fp_reference is None:
        fp_reference = sampler.sample(fp_apply, z, y, mask,
                                      sampler_type="ddim")
    scores = {}
    for hi, lo in windows:
        out = _segmented_sample(sampler, fp_apply, q_apply, z, y, mask,
                                hi, lo, qctx_factory)
        scores[f"{hi}-{lo}"] = float(metric_fn(out, fp_reference))
    return scores


def uniform_windows(n_steps: int, split_timestep: int = 4) -> List[Tuple[int, int]]:
    """The reference block_group mode's uniform timestep split
    (get_sensitivity.py:480,727-731: quant_time_list = [i*n//split], window
    = [qtl[k], qtl[k]+n//split-1]), returned descending."""
    qtl = [i * n_steps // split_timestep for i in range(split_timestep)]
    size = n_steps // split_timestep
    return [(qtl[k] + size - 1, qtl[k])
            for k in range(split_timestep - 1, -1, -1)]


def spec_with_bits(base: LayerQuantSpec, n_bits: int) -> LayerQuantSpec:
    """Reset both weight and act to one bit-width (reference set_layer_bit
    'reset' pairs, get_sensitivity.py:469-470)."""
    w = (dataclasses.replace(base.weight, n_bits=n_bits)
         if base.weight is not None else None)
    a = (dataclasses.replace(base.act, n_bits=n_bits)
         if base.act is not None else None)
    return dataclasses.replace(base, weight=w, act=a)


def block_group_resolver(base: LayerQuantSpec, block_idx: int, group: str,
                         fp_patterns: Sequence[str] = ()):
    """Quantize ONLY layers inside block `block_idx` matching `group`
    (reference get_sensitivity.py:491-501: selected_layers =
    'model.blocks.{j}.' in name AND group_name in name)."""
    def resolve(name: str) -> Optional[LayerQuantSpec]:
        if (pattern_in(name, f"blocks.{block_idx}")
                and pattern_in(name, group)
                and not any(pattern_in(name, p) for p in fp_patterns)):
            return base
        return base.disabled()
    return resolve


def block_group_sensitivity(sampler, fp_apply, make_q_apply, z, y, mask,
                            base: LayerQuantSpec, n_blocks: int,
                            qctx_factory, groups: Sequence[str] = ("attn",),
                            bits: Sequence[int] = (8,),
                            split_timestep: int = 4,
                            fp_patterns: Sequence[str] = (),
                            fp_reference=None,
                            metric_fn: Callable = frame_mse
                            ) -> Dict[str, float]:
    """block x group x timestep-window sensitivity (the reference's
    block_group_wise_quant mode, get_sensitivity.py:467-521 outer loop over
    bits, :727-741 windowed variant; gaussian_diffusion.py:728-738): for
    each (bit, window, block, group), quantize ONLY that block's group
    layers at that bit-width inside the timestep window, everything else
    FP, generate, and score frame-MSE vs the FP generation.

    make_q_apply(resolver) -> apply fn with that static quant layout
    (replaces the reference's mutable set_layer_quant/set_layer_bit calls).
    Returns {"bit{b}/{hi}-{lo}/blocks.{j}.{group}": mse}.
    """
    if fp_reference is None:
        fp_reference = sampler.sample(fp_apply, z, y, mask,
                                      sampler_type="ddim")
    windows = uniform_windows(sampler.schedule.n_steps, split_timestep)
    scores: Dict[str, float] = {}
    for b in bits:
        spec_b = spec_with_bits(base, b)
        for j in range(n_blocks):
            for g in groups:
                q_apply = make_q_apply(
                    block_group_resolver(spec_b, j, g, fp_patterns))
                for hi, lo in windows:
                    out = _segmented_sample(sampler, fp_apply, q_apply,
                                            z, y, mask, hi, lo,
                                            qctx_factory)
                    key = f"bit{b}/{hi}-{lo}/blocks.{j}.{g}"
                    scores[key] = float(metric_fn(out, fp_reference))
    return scores


def block_group_to_range_scores(scores: Mapping[str, float],
                                bit: Optional[int] = None
                                ) -> Dict[str, Dict[str, float]]:
    """Reshape block_group_sensitivity output into the
    {range: {layer_pattern: score}} form `generate_mp_config` consumes —
    the closed loop the reference runs offline through metric.ipynb."""
    out: Dict[str, Dict[str, float]] = {}
    for key, v in scores.items():
        bpart, rng_key, layer = key.split("/")
        if bit is not None and bpart != f"bit{bit}":
            continue
        out.setdefault(rng_key, {})[layer] = v
    return out


# ---------------- sweep alpha ----------------

def capture_layer_inputs(model, variables, example_args,
                         mode: str = "fp") -> Dict[str, jnp.ndarray]:
    """One forward with input capture; returns {dotted_layer_name: input}."""
    _, inter = model.apply(
        variables, *example_args,
        qctx=QuantCtx(mode=mode, capture=True),
        mutable=["intermediates"])
    flat = traverse_util.flatten_dict(inter["intermediates"])
    out = {}
    for path, val in flat.items():
        if path[-1] == "input":
            # flax sow stores a tuple of sown values
            out[path_to_dotted(path[:-1])] = val[0]
    return out


def sweep_alpha_for_layer(x: jnp.ndarray, kernel: jnp.ndarray,
                          lspec: LayerQuantSpec,
                          alphas: Optional[np.ndarray] = None
                          ) -> Tuple[float, Dict[float, float]]:
    """Best smooth-quant alpha for one layer by quantized-output MSE.

    Reference sweep grid 0.475 -> 0.9 step 0.01 (sweep_alpha.py:259-270).
    x: captured layer input [..., C_in]; kernel: [C_in, F].
    """
    if alphas is None:
        alphas = np.arange(0.475, 0.9, 0.01)
    x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    kernel = kernel.astype(jnp.float32)
    ref = x @ kernel
    a_absmax = jnp.max(jnp.abs(x), axis=0)
    w_absmax = jnp.max(jnp.abs(kernel), axis=-1)
    wspec, aspec = lspec.weight, lspec.act

    def loss_for(alpha: float) -> float:
        cs = core.smooth_quant_scale(a_absmax, w_absmax, alpha)
        xb = x / cs
        wb = kernel * cs[:, None]
        wd, wz = core.compute_qparams(wb, wspec)
        wq = core.fake_quant(wb, wd, wz, wspec)
        xq = core.fake_quant_dynamic(xb[None], aspec)[0] if aspec else xb
        return float(jnp.mean((xq @ wq - ref) ** 2))

    losses = {round(float(a), 4): loss_for(float(a)) for a in alphas}
    best = min(losses, key=losses.get)
    return best, losses


def sweep_alpha(model, variables, example_args, resolver,
                alphas: Optional[np.ndarray] = None) -> Dict[str, float]:
    """Per-layer best alpha dict (reference sweep_alpha.py output)."""
    inputs = capture_layer_inputs(model, variables, example_args)
    flat_p = traverse_util.flatten_dict(variables["params"])
    kernels = {path_to_dotted(p[:-1]): v for p, v in flat_p.items()
               if p[-1] == "kernel"}
    best = {}
    for name, x in inputs.items():
        lspec = resolver(name)
        if lspec is None or not lspec.weight_quant:
            continue
        if name not in kernels:
            continue
        best[name], _ = sweep_alpha_for_layer(x, kernels[name], lspec, alphas)
    return best


# ---------------- smooth-quant layer selection ----------------

def smooth_quant_candidates(model, variables, example_args, resolver,
                            act_ratio_threshold: float = 10.0
                            ) -> List[str]:
    """Layers whose activation channel ranges are badly imbalanced relative
    to their weights — the CB shortlist (reference
    get_smooth_quant_list.py:70-110 range-ratio heuristics)."""
    inputs = capture_layer_inputs(model, variables, example_args)
    flat_p = traverse_util.flatten_dict(variables["params"])
    kernels = {path_to_dotted(p[:-1]): v for p, v in flat_p.items()
               if p[-1] == "kernel"}
    picks = []
    for name, x in inputs.items():
        if name not in kernels or resolver(name) is None:
            continue
        xf = jnp.abs(x.reshape(-1, x.shape[-1]).astype(jnp.float32))
        ch_max = jnp.maximum(jnp.max(xf, axis=0), 1e-9)
        ratio = float(jnp.max(ch_max) / jnp.maximum(jnp.median(ch_max), 1e-9))
        if ratio > act_ratio_threshold:
            picks.append(name)
    return picks


# ---------------- mixed-precision config generation ----------------

def generate_mp_config(sensitivity: Mapping[str, Mapping[str, float]],
                       bits_low: int = 4, bits_high: int = 8,
                       high_fraction: float = 0.25,
                       fp_fraction: float = 0.0) -> Dict:
    """Generate a timestep-wise bitwidth-config YAML dict from per-range
    per-layer sensitivity scores.

    sensitivity: {'19-15': {layer_name: score}, ...} (higher = more
    sensitive). Per range, the most sensitive `high_fraction` of layers get
    `bits_high`, the extreme tail `fp_fraction` goes to fp_layers, the rest
    get `bits_low` — the role of the reference's offline
    analysis_tools/mixed_precision/metric.ipynb cell 3 that emits
    t20_*_mp.yaml.
    """
    out: Dict = {"fp_layers": []}
    fp_set = set()
    for rng_key, scores in sensitivity.items():
        ranked = sorted(scores, key=scores.get, reverse=True)
        n = len(ranked)
        n_fp = int(n * fp_fraction)
        n_high = int(n * high_fraction)
        alloc = {}
        for i, name in enumerate(ranked):
            if i < n_fp:
                fp_set.add(name)
            elif i < n_fp + n_high:
                alloc[name] = bits_high
            else:
                alloc[name] = bits_low
        out[rng_key] = alloc
    out["fp_layers"] = sorted(fp_set)
    return out


# ---------------- PTQD ----------------

def calibrate_ptqd_k(fp_outs: jnp.ndarray, quant_outs: jnp.ndarray
                     ) -> np.ndarray:
    """Per-timestep correlated-noise coefficient k_t.

    fp_outs/quant_outs: [n_steps, ...] model eps outputs from matched FP and
    quantized trajectories (reference calibrate_ptqd_k.py:220-272: quant
    noise modeled as (1+k) * fp + uncorrelated part; k from lstsq per step).
    """
    n = fp_outs.shape[0]
    ks = []
    for i in range(n):
        f = np.asarray(fp_outs[i], np.float64).ravel()
        q = np.asarray(quant_outs[i], np.float64).ravel()
        denom = float(f @ f) + 1e-12
        ks.append(float(q @ f) / denom - 1.0)
    return np.asarray(ks, np.float32)


def apply_ptqd_correction(model_out: jnp.ndarray, k_t: jnp.ndarray,
                          step_idx) -> jnp.ndarray:
    """Opt-in PTQD correction: divide by (1 + k_t[step])."""
    k = jnp.asarray(k_t)[step_idx]
    return model_out / (1.0 + k)


# ---------------- timestep-wise mixed precision ----------------

def mp_overrides_for_range(mp_weight: Mapping[str, int],
                           mp_act: Optional[Mapping[str, int]],
                           base: LayerQuantSpec
                           ) -> Dict[str, LayerQuantSpec]:
    """Per-layer LayerQuantSpec overrides from a bitwidth-config range
    ({'model.blocks.0.attn.q': 4, ...}; reference t20_*_mp.yaml +
    load_bitwidth_config, quant_model.py:562-586). The 'model.' prefix of
    the reference naming is stripped."""
    overrides: Dict[str, LayerQuantSpec] = {}
    names = set(mp_weight) | set(mp_act or {})
    for name in names:
        clean = name[6:] if name.startswith("model.") else name
        spec = base
        wb = mp_weight.get(name)
        ab = (mp_act or {}).get(name)
        if wb is not None and spec.weight is not None:
            spec = dataclasses.replace(spec, weight=spec.weight.with_bits(wb))
        if ab is not None and spec.act is not None:
            # dynamic acts switch bitwidth freely (qparams are computed
            # online); static acts are validated against the calibrated
            # bits_tuple by with_bits — the reference applies
            # bitwidth_refactor to act quantizers unconditionally
            # (quant_model.py:562-586)
            spec = dataclasses.replace(spec, act=spec.act.with_bits(ab))
        overrides[clean] = spec
    return overrides


def parse_mp_ranges(mp_cfg: Mapping) -> List[Tuple[Tuple[int, int], Dict]]:
    """'19-15' style sampler-step ranges -> [((hi, lo), layer_bits)],
    sorted descending (sampling order). 'fp_layers' keys pass through."""
    out = []
    for key, val in mp_cfg.items():
        if key == "fp_layers" or not isinstance(val, Mapping):
            continue
        hi, lo = (int(v) for v in key.split("-"))
        out.append(((hi, lo), dict(val)))
    return sorted(out, key=lambda r: -r[0][0])
