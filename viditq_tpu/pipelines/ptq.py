"""PTQ driver: smooth-quant stats -> weight tables -> act tables.

Reference flow: `t2v/scripts/ptq.py:27-451` / `t2i/scripts/ptq.py:40-517`.
The reference mutates quantizer modules during "init forwards"; here each
phase is a jitted apply with explicit mutable collections, and the
weight/act table computation happens offline (viditq_tpu.quant.calibrate).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from viditq_tpu.quant import calibrate
from viditq_tpu.quant.qlinear import QuantCtx


def subsample_calib_steps(n_total: int, n_steps: int) -> np.ndarray:
    """Evenly subsample calib trajectory step indices
    (reference get_quant_calib_data, qdiff/utils.py:17-63: stride =
    total // n_steps)."""
    stride = max(n_total // n_steps, 1)
    idx = np.arange(0, n_total, stride)[:n_steps]
    return idx


def act_slot_map_from_ts(calib_ts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Map original timesteps [0,1000) to compact act-table slots.

    Returns (slot_map [1000], sorted_calib_ts). Slot i belongs to the i-th
    smallest calibrated timestep; lookups take the nearest slot — the compact
    equivalent of `repeat_timestep_wise_quant_params`
    (quant_model.py:184-197)."""
    sorted_ts = np.sort(np.unique(np.asarray(calib_ts)))
    t = np.arange(1000)
    slot = np.abs(t[:, None] - sorted_ts[None, :]).argmin(axis=1)
    return slot.astype(np.int32), sorted_ts


@dataclasses.dataclass
class PTQResult:
    variables: Dict
    act_slot_map: Optional[np.ndarray]
    calib_ts: Optional[np.ndarray]


def run_ptq(model, variables: Dict, calib_data: Dict, plan,
            resolver: Callable, n_calib_steps: Optional[int] = None,
            batch_size: Optional[int] = None,
            resume_w_quantized: Optional[str] = None) -> PTQResult:
    """Run the full PTQ calibration.

    calib_data: {'xs': [n_steps, NB, ...], 'ts': [n_steps, NB],
                 'y': [NB, 1, L, C_cap], 'mask': [B0, L] or None}
    (the sampler trajectory capture, gaussian_diffusion.py:679-689).

    resume_w_quantized: path to a prior quant checkpoint whose WEIGHT
    tables (w_delta/w_zp/w_alpha) are loaded instead of recalibrating —
    the `resume_with_w_quantized:` YAML key (dead in the reference code,
    present in every shipped config, e.g. w8a8_dynamic.yaml:42; we
    implement the evident intent). Defaults to plan.resume_w_path.
    """
    xs = np.asarray(calib_data["xs"])
    ts = np.asarray(calib_data["ts"])
    y = jnp.asarray(calib_data["y"])
    mask = calib_data.get("mask")
    mask = jnp.asarray(mask) if mask is not None else None
    n_total = xs.shape[0]
    nb = xs.shape[1]
    n_steps = min(n_calib_steps or plan.calib_n_steps, n_total)
    bs = batch_size or plan.calib_batch_size
    step_idx = subsample_calib_steps(n_total, n_steps)

    variables = dict(variables)
    lspec = plan.default_layer
    smooth = lspec.smooth_quant

    # Phase gating must consider PER-LAYER resolved specs, not just the
    # plan default — a resolver that enables smooth-quant or static acts
    # only on an override shortlist still needs those calibration phases
    # (the stats would otherwise stay at their zero/-1 sentinels).
    from flax import traverse_util
    from viditq_tpu.quant.calibrate import path_to_dotted
    layer_specs = []
    flat_probe = traverse_util.flatten_dict(variables.get("quant", {}))
    seen = set()
    for path in flat_probe:
        if path[-1] in ("w_delta", "a_delta") and path[:-1] not in seen:
            seen.add(path[:-1])
            s = resolver(path_to_dotted(path[:-1]))
            if s is not None:
                layer_specs.append(s)
    any_smooth_momentum = (
        (smooth.enable and "momentum" in smooth.channel_wise_scale_type)
        or any(s.smooth_quant.enable
               and "momentum" in s.smooth_quant.channel_wise_scale_type
               for s in layer_specs))
    any_static_act = (
        (lspec.act is not None and not lspec.act.dynamic and lspec.act_quant)
        or any(s.act is not None and not s.act.dynamic and s.act_quant
               for s in layer_specs))

    other = {k: v for k, v in variables.items()
             if k not in ("quant", "qstats")}

    @jax.jit
    def sq_stat_step(quant, qstats, x, t, yb, mb, t_id):
        vs = {**other, "quant": quant, "qstats": qstats}
        _, upd = model.apply(vs, x, t, yb, mb,
                             qctx=QuantCtx(mode="sq_stat", t_id=t_id),
                             mutable=["quant", "qstats"])
        return upd["quant"], upd["qstats"]

    @jax.jit
    def a_calib_step(quant, qstats, x, t, yb, mb, t_id, slot):
        vs = {**other, "quant": quant, "qstats": qstats}
        _, upd = model.apply(vs, x, t, yb, mb,
                             qctx=QuantCtx(mode="a_calib", t_id=t_id,
                                           act_slot=slot),
                             mutable=["qstats"])
        return upd["qstats"]

    # Phase 1 — smooth-quant act_scale running stats over every calib step
    # (ptq.py:219-264). Batch over samples like the reference's chunked loop.
    if any_smooth_momentum:
        quant, qstats = variables["quant"], variables["qstats"]
        for s in step_idx:
            t_id = jnp.asarray(int(ts[s, 0]), jnp.int32)
            for b0 in range(0, nb, bs):
                xb = jnp.asarray(xs[s, b0:b0 + bs])
                tb = jnp.asarray(ts[s, b0:b0 + bs], jnp.float32)
                yb = y[b0:b0 + bs]
                quant, qstats = sq_stat_step(
                    quant, qstats, xb, tb, yb,
                    _mask_slice(mask, b0, bs, nb), t_id)
        variables["quant"] = quant
        variables["qstats"] = qstats

    # Phase 2 — weight tables, offline (replaces ptq.py:266-293 forwards);
    # or resumed verbatim from a prior quant checkpoint
    resume_w = resume_w_quantized or getattr(plan, "resume_w_path", None)
    if resume_w:
        variables["quant"] = _merge_resumed_weight_tables(
            variables["quant"], resume_w)
    else:
        variables["quant"] = calibrate.calibrate_weight_tables(
            variables["params"], variables["quant"], resolver)

    # Phase 3 — static act ranges per timestep slot (ptq.py:296-361);
    # skipped entirely for dynamic act quant (:308-309)
    aspec = lspec.act
    slot_map = None
    calib_ts = np.array([int(ts[s, 0]) for s in step_idx])
    if any_static_act:
        slot_full, sorted_ts = act_slot_map_from_ts(calib_ts)
        t_to_slot = {int(t): i for i, t in enumerate(sorted_ts)}
        quant, qstats = variables["quant"], variables["qstats"]
        for s in step_idx:
            t_int = int(ts[s, 0])
            slot = jnp.asarray(t_to_slot[t_int], jnp.int32)
            t_id = jnp.asarray(t_int, jnp.int32)
            for b0 in range(0, nb, bs):
                xb = jnp.asarray(xs[s, b0:b0 + bs])
                tb = jnp.asarray(ts[s, b0:b0 + bs], jnp.float32)
                yb = y[b0:b0 + bs]
                qstats = a_calib_step(
                    quant, qstats, xb, tb, yb,
                    _mask_slice(mask, b0, bs, nb), t_id, slot)
        variables["qstats"] = qstats
        variables["quant"] = calibrate.finalize_act_tables(
            variables["quant"], variables["qstats"], resolver)
        slot_map = slot_full
    # (dynamic act + smooth quant needs no act tables — t_id -> timerange
    # lookups happen at inference)

    return PTQResult(variables=variables, act_slot_map=slot_map,
                     calib_ts=calib_ts)


def _merge_resumed_weight_tables(quant_vars: Dict, path: str) -> Dict:
    """Overwrite this model's weight-quantizer entries (w_delta/w_zp/
    w_alpha) with those from a saved quant checkpoint; act-side entries
    (a_delta/a_zp/act_scale and attention-internal tables) keep their
    current values so act calibration proceeds normally."""
    from flax import traverse_util
    from viditq_tpu.quant.calibrate import path_to_dotted
    data = np.load(path, allow_pickle=False)
    flat_cur = traverse_util.flatten_dict(quant_vars)
    by_name = {path_to_dotted(p[:-1]): p[:-1] for p in flat_cur}
    n = 0
    for key in data.files:
        if key == "__meta__" or "::" not in key:
            continue
        name, tab = key.split("::")
        if tab not in ("w_delta", "w_zp", "w_alpha"):
            continue  # act-side tables come from THIS run's calibration
        base = by_name.get(name)
        if base is None:
            raise ValueError(
                f"resume_with_w_quantized: checkpoint layer {name} not in "
                "this model/plan — plan mismatch")
        v = data[key]
        cur = flat_cur[base + (tab,)]
        if tuple(cur.shape) != tuple(v.shape):
            raise ValueError(
                f"resume_with_w_quantized: {name}.{tab} shape {v.shape} != "
                f"model's {tuple(cur.shape)} (different bit list / "
                "timerange count?)")
        flat_cur[base + (tab,)] = jnp.asarray(v)
        n += 1
    if n == 0:
        raise ValueError(f"resume_with_w_quantized: {path} holds no "
                         "weight tables")
    return traverse_util.unflatten_dict(flat_cur)


def _mask_slice(mask, b0, bs, nb):
    """calib batches are CFG-doubled [cond; null]; the mask is per-prompt
    [B0, L]. Index per row modulo the cond half so batches that cross the
    cond/null boundary (or bs not dividing nb//2) still pair each x row with
    its own prompt's mask."""
    if mask is None:
        return None
    half = max(nb // 2, 1)
    rows = np.arange(b0, min(b0 + bs, nb)) % half
    rows = rows % mask.shape[0]  # tolerate B0 < half (repeated prompts)
    return mask[jnp.asarray(rows)]
