"""Quant-config loading: the reference's OmegaConf YAML schema -> specs.

Parses the exact YAML layout shipped by ViDiT-Q
(`t2v/configs/quant/opensora/*.yaml`, `t2i/configs/quant/{alpha,sigma}/
*.yaml`; loaded at `t2v/scripts/ptq.py:60`) so existing config files work
verbatim, but resolves them into frozen `QuantSpec`/`LayerQuantSpec` objects
plus a plain `QuantPlanConfig` — no OmegaConf dependency.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import yaml

from viditq_tpu.quant.naming import load_fp_list, resolve_layer_spec
from viditq_tpu.quant.spec import LayerQuantSpec, QuantSpec, SmoothQuantSpec


def _granularity(per_group) -> str:
    if per_group in (False, None, "False", "None"):
        return "tensor"
    if per_group in ("channel", "token"):
        return per_group
    if per_group == "group":
        # the reference's w6a6_smooth_quant.yaml says per_group: "group",
        # a value its quantizer doesn't actually handle (base_quantizer.py
        # :169-177 only matches 'channel'/'token'); the intended semantics
        # for a dynamic-act smooth-quant plan is per-token
        return "token"
    raise ValueError(f"unknown per_group {per_group!r}")


def parse_weight_spec(cfg: Dict[str, Any],
                      mixed_precision=None) -> QuantSpec:
    q = cfg["quantizer"]
    return QuantSpec(
        n_bits=int(q["n_bits"]),
        granularity=_granularity(q.get("per_group", "channel")),
        channel_axis=-1,  # JAX [C_in, C_out] layout == torch channel_dim=0
        scale_method=q.get("scale_method", "min_max"),
        round_mode=q.get("round_mode", "nearest"),
        sym=bool(q.get("sym", False)),
        mixed_precision=tuple(mixed_precision) if mixed_precision else None,
    )


def parse_act_spec(cfg: Dict[str, Any], mixed_precision=None,
                   timestep_wise: bool = False,
                   n_timestep: int = 1) -> QuantSpec:
    q = cfg["quantizer"]
    dynamic = bool(q.get("dynamic", False))
    return QuantSpec(
        n_bits=int(q["n_bits"]),
        granularity=_granularity(q.get("per_group", False)),
        channel_axis=-1,
        scale_method=q.get("scale_method", "min_max"),
        round_mode=q.get("round_mode", "nearest_ste"),
        sym=bool(q.get("sym", False)),
        dynamic=dynamic,
        running_stat=bool(q.get("running_stat", False)),
        mixed_precision=(tuple(mixed_precision)
                         if (mixed_precision and not dynamic) else None),
        timestep_wise=bool(timestep_wise) and not dynamic,
        n_timestep=n_timestep if (timestep_wise and not dynamic) else 1,
    )


def parse_smooth_spec(cfg: Dict[str, Any]) -> SmoothQuantSpec:
    sq = (cfg.get("quantizer", {}) or {}).get("smooth_quant") or {}
    if not sq or not sq.get("enable", False):
        return SmoothQuantSpec()
    alpha = sq.get("alpha", 0.5)
    if not isinstance(alpha, (list, tuple)):
        alpha = (float(alpha),)
    else:
        alpha = tuple(float(a) for a in alpha)
    timerange = sq.get("timerange", [[0, 1000]])
    timerange = tuple(tuple(int(v) for v in r) for r in timerange)
    return SmoothQuantSpec(
        enable=True,
        channel_wise_scale_type=sq.get("channel_wise_scale_type",
                                       "momentum_act_max"),
        momentum=float(sq.get("momentum", 0.95)),
        alpha=alpha, timerange=timerange,
        # extension key (not in the reference YAML schema): opt INTO the
        # self-consistent per-timerange weight tables; the default mirrors
        # the reference runtime, which freezes the weight qparams at
        # timerange 0 (SmoothQuantSpec.frozen_tr0_weights)
        frozen_tr0_weights=not bool(sq.get("corrected_tr_weight_tables",
                                           False)),
        # extension key: pool the balancing scale across sibling q/k/v
        # (the upstream fused-qkv granularity) so their input rescale +
        # quantize collapses to one shared producer pass — the TPU-native
        # perf plans' knob (SmoothQuantSpec.qkv_share_cs)
        qkv_share_cs=bool(sq.get("qkv_share_cs", False)))


@dataclasses.dataclass(frozen=True)
class OptimizationConfig:
    """Parsed `quant.{weight,activation}.optimization` section — the
    reference's recon knobs (t2i/scripts/ptq.py:320-359: presence of
    `optimization.params` turns reconstruction on; lr per param type,
    loss lambda/warmup, joint weight+act optimization)."""

    iters: int = 2000
    lambda_coeff: float = 1.0
    warmup: float = 0.0
    alpha_lr: Optional[float] = None
    delta_lr: Optional[float] = None
    joint_weight_act: bool = False
    # ours: reconstruction granularity — 'layer' (reference model_recon
    # recursion) or 'block' (reference block_reconstruction: joint
    # block-output optimization)
    granularity: str = "layer"

    @property
    def enabled(self) -> bool:
        return self.alpha_lr is not None or self.delta_lr is not None


def parse_optimization(sec) -> Optional["OptimizationConfig"]:
    if not isinstance(sec, dict):
        return None
    loss = sec.get("loss") or {}
    params = sec.get("params") or {}

    def lr(name):
        p = params.get(name)
        return float(p["lr"]) if isinstance(p, dict) and "lr" in p else None
    return OptimizationConfig(
        iters=int(sec.get("iters", 2000)),
        lambda_coeff=float(loss.get("lambda_coeff", 1.0)),
        warmup=float(loss.get("warmup", 0.0)),
        alpha_lr=lr("alpha"), delta_lr=lr("delta"),
        joint_weight_act=bool(sec.get("joint_weight_act_opt", False)),
        granularity=str(sec.get("granularity", "layer")))


@dataclasses.dataclass(frozen=True)
class QuantPlanConfig:
    """One parsed quant YAML (the reference 'ptq_config')."""

    default_layer: LayerQuantSpec
    fp_patterns: Tuple[str, ...] = ()
    # per-layer execution-mode overrides: (pattern, mode) with mode in
    # {'native', 'simulate', 'weight_only'} — lets a plan run e.g. full
    # W8A8 int8 on the memory-bound MLPs and int8-stored/bf16-compute
    # weights elsewhere (see BENCH_NOTES.md)
    backend_overrides: Tuple[Tuple[str, str], ...] = ()
    model_id: str = "opensora"
    model_type: str = "opensora"
    cfg_split: bool = False
    mixed_precision: Optional[Tuple[int, ...]] = None
    timestep_wise: bool = False
    calib_n_steps: int = 10
    calib_n_samples: int = 10
    calib_batch_size: int = 4
    n_spatial_token: int = 1024
    n_temporal_token: int = 16
    n_prompt: int = 120
    weight_opt: Optional["OptimizationConfig"] = None
    act_opt: Optional["OptimizationConfig"] = None
    # `resume_with_w_quantized: {path: ...}` — present in every reference
    # YAML but read by no reference code (dead key, e.g.
    # t2v/configs/quant/opensora/w8a8_dynamic.yaml:42). We implement the
    # evident intent: resume PTQ from a prior quant checkpoint's WEIGHT
    # tables (w_delta/w_zp/w_alpha) and skip weight calibration; act
    # calibration still runs. `path: None` (all shipped configs) is a no-op.
    resume_w_path: Optional[str] = None

    # restrict the attention-internal quantizers to matching layer-name
    # patterns (e.g. softmax int8 on the temporal/cross attentions only —
    # where the int8 PV execution measured a win; BENCH_NOTES round-2c).
    # Empty = apply wherever the spec is set.
    softmax_scope: Tuple[str, ...] = ()
    attn_act_scope: Tuple[str, ...] = ()

    def resolver(self, overrides=None):
        """Layer-name -> LayerQuantSpec resolver for model construction and
        offline calibration."""
        from viditq_tpu.quant.naming import any_pattern_in, pattern_in
        default = self.default_layer
        fp = self.fp_patterns
        backend_ov = self.backend_overrides
        sm_scope = self.softmax_scope
        aa_scope = self.attn_act_scope

        def resolve(name: str) -> Optional[LayerQuantSpec]:
            spec = resolve_layer_spec(name, default, fp, overrides)
            if spec is None:
                return None
            if (sm_scope and spec.softmax is not None
                    and not any_pattern_in(name, sm_scope)):
                spec = dataclasses.replace(spec, softmax=None)
            if (aa_scope and spec.attn_act is not None
                    and not any_pattern_in(name, aa_scope)):
                spec = dataclasses.replace(spec, attn_act=None)
            for pat, mode in backend_ov:
                if pattern_in(name, pat):
                    if mode == "weight_only":
                        spec = dataclasses.replace(spec, backend="native",
                                                   act_quant=False)
                    elif mode == "fused":
                        spec = dataclasses.replace(spec, backend="native",
                                                   impl="fused")
                    else:
                        spec = dataclasses.replace(spec, backend=mode)
                    break
            return spec
        return resolve

    def uses_native(self) -> bool:
        """True when any layer runs the native int backend — either via the
        default or via per-group backend_overrides (hybrid plans). Callers
        must pack int weight slabs (native_pack) before quant inference."""
        if self.default_layer.backend == "native":
            return True
        return any(mode in ("native", "weight_only", "fused", "static")
                   for _, mode in self.backend_overrides)

    def with_backend(self, backend: str) -> "QuantPlanConfig":
        """Switch between 'simulate' (reference-parity fake quant),
        'native' (int execution via the XLA int8 path), and 'fused'
        (native + the Pallas producer/consumer kernels — the measured-fast
        configuration on v5e; same mapping as the YAML `backend: fused`)."""
        if backend == "fused":
            return dataclasses.replace(
                self, default_layer=dataclasses.replace(
                    self.default_layer, backend="native", impl="fused"))
        return dataclasses.replace(
            self, default_layer=dataclasses.replace(
                self.default_layer, backend=backend))

    def with_bits(self, w_bits: Optional[int] = None,
                  a_bits: Optional[int] = None) -> "QuantPlanConfig":
        """Switch active bitwidths (reference set_layer_bit /
        bitwidth_refactor) — valid when mixed_precision contains them."""
        d = self.default_layer
        new = dataclasses.replace(
            d,
            weight=d.weight.with_bits(w_bits) if w_bits and d.weight else d.weight,
            act=d.act.with_bits(a_bits) if a_bits and d.act else d.act)
        return dataclasses.replace(self, default_layer=new)


def load_quant_config(path: str, part_fp: bool = True,
                      calib_n_timestep: Optional[int] = None,
                      smooth_quant_alpha: Optional[float] = None,
                      timestep_wise: bool = False) -> QuantPlanConfig:
    """Load a reference-format quant YAML (t2v/scripts/ptq.py:60-148)."""
    with open(path) as f:
        cfg = yaml.safe_load(f)
    mp = cfg.get("mixed_precision")
    quant = cfg["quant"]
    n_ts = calib_n_timestep or int(cfg.get("calib_data", {}).get("n_steps", 10))
    wspec = parse_weight_spec(quant["weight"], mp)
    aspec = parse_act_spec(quant["activation"], mp,
                           timestep_wise=timestep_wise, n_timestep=n_ts)
    smooth = parse_smooth_spec(quant["activation"])
    if smooth_quant_alpha is not None and smooth.enable:
        smooth = dataclasses.replace(
            smooth, alpha=tuple(smooth_quant_alpha
                                for _ in smooth.alpha))
    # optional attention-internal quantizers (reference YAML 'softmax:' key
    # under the act quantizer; empty in the shipped configs)
    act_q_cfg = quant["activation"]["quantizer"]
    softmax_spec = attn_act_spec = None
    sm_cfg = act_q_cfg.get("softmax")
    if isinstance(sm_cfg, dict) and sm_cfg.get("n_bits"):
        softmax_spec = QuantSpec(
            n_bits=int(sm_cfg["n_bits"]),
            granularity=_granularity(sm_cfg.get("per_group", False)),
            round_mode=sm_cfg.get("round_mode", "nearest_ste"),
            always_zero=bool(sm_cfg.get("always_zero", True)),
            dynamic=True)
    aa_cfg = act_q_cfg.get("attn_act")
    if isinstance(aa_cfg, dict) and aa_cfg.get("n_bits"):
        attn_act_spec = QuantSpec(
            n_bits=int(aa_cfg["n_bits"]),
            granularity=_granularity(aa_cfg.get("per_group", "token")),
            round_mode=aa_cfg.get("round_mode", "nearest_ste"),
            sym=bool(aa_cfg.get("sym", False)),
            dynamic=True)
    default = LayerQuantSpec(weight=wspec, act=aspec, smooth_quant=smooth,
                             softmax=softmax_spec, attn_act=attn_act_spec)
    # optional plan-level default backend ('native' / 'fused'); per-group
    # backend_overrides still win
    plan_backend = cfg.get("backend")
    if plan_backend == "fused":
        default = dataclasses.replace(default, backend="native",
                                      impl="fused")
    elif plan_backend:
        default = dataclasses.replace(default, backend=str(plan_backend))

    fp_patterns: Tuple[str, ...] = ()
    fp_path = cfg.get("part_fp_list")
    if part_fp and fp_path and fp_path not in ("", "None"):
        try:
            fp_patterns = load_fp_list(fp_path)
        except FileNotFoundError:
            # allow paths relative to the YAML's directory
            import os
            alt = os.path.join(os.path.dirname(path), os.path.basename(fp_path))
            fp_patterns = load_fp_list(alt)

    act_q = quant["activation"]["quantizer"]
    calib = cfg.get("calib_data", {})
    model = cfg.get("model", {})
    backend_ov = tuple(
        (str(k), str(v))
        for k, v in (cfg.get("backend_overrides") or {}).items())
    sm_scope = tuple((sm_cfg or {}).get("scope") or ()) \
        if isinstance(sm_cfg, dict) else ()
    aa_scope = tuple((aa_cfg or {}).get("scope") or ()) \
        if isinstance(aa_cfg, dict) else ()
    return QuantPlanConfig(
        default_layer=default,
        fp_patterns=fp_patterns,
        backend_overrides=backend_ov,
        softmax_scope=sm_scope,
        attn_act_scope=aa_scope,
        model_id=model.get("model_id", "opensora"),
        model_type=model.get("model_type", "opensora"),
        cfg_split=bool(cfg.get("cfg_split", False)),
        mixed_precision=tuple(mp) if mp else None,
        timestep_wise=timestep_wise,
        calib_n_steps=int(calib.get("n_steps", 10)),
        calib_n_samples=int(calib.get("n_samples", 10)),
        calib_batch_size=int(calib.get("batch_size", 4)),
        n_spatial_token=int(act_q.get("n_spatial_token", 1024)),
        n_temporal_token=int(act_q.get("n_temporal_token", 16)),
        n_prompt=int(act_q.get("n_prompt", 120)),
        weight_opt=parse_optimization(quant["weight"].get("optimization")),
        act_opt=parse_optimization(
            quant["activation"].get("optimization")),
        resume_w_path=_resume_w_path(cfg.get("resume_with_w_quantized")),
    )


def _resume_w_path(sec) -> Optional[str]:
    p = sec.get("path") if isinstance(sec, dict) else sec
    if p in (None, "", "None", "none"):
        return None
    return str(p)


def load_bitwidth_config(path: str) -> Dict[str, Dict[str, int]]:
    """Timestep-wise mixed-precision YAML: {'19-15': {layer: bits, ...},
    'fp_layers': [...]} (reference t20_*_mp.yaml,
    gaussian_diffusion.py:740-767)."""
    with open(path) as f:
        return yaml.safe_load(f)
