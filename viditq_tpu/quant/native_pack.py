"""Offline packing of calibrated weights into the native int8 layout.

After PTQ fills w_delta/w_zp, this pass quantizes every native-backend
layer's kernel into int8 slabs (per smooth-quant timerange) plus column
sums for the zero-point epilogue correction — the deploy-time counterpart of
the reference's per-forward weight fake-quant (quant_layer.py:168-185).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

import dataclasses

from viditq_tpu.quant.calibrate import (_layer_dirs, path_to_dotted,
                                        resolve_scanned)
from viditq_tpu.quant.spec import LayerQuantSpec


def add_native_slots(quant_vars: Dict, params: Dict,
                     resolve: Callable[[str], Optional[LayerQuantSpec]]
                     ) -> Dict:
    """Insert empty w_int/w_colsum slots into a 'quant' collection that was
    calibrated with the simulate backend, so the same variables can drive a
    backend='native' model after `pack_native_weights`."""
    flat_q = traverse_util.flatten_dict(quant_vars)
    flat_p = traverse_util.flatten_dict(params)
    for layer_path in _layer_dirs(quant_vars, "w_delta"):
        kern = flat_p[layer_path + ("kernel",)]
        if kern.ndim == 3:
            # scanned stack: slot SHAPES follow block 0's spec (the name the
            # model's structure was resolved under, stdit.py scan prefix)
            specs = resolve_scanned(layer_path, kern.shape[0], resolve)
            lspec = None if specs is None else specs[0]
        else:
            lspec = resolve(path_to_dotted(layer_path))
        if lspec is None or lspec.weight is None or not lspec.weight_quant:
            continue
        full_native = (lspec.act is not None and lspec.act.dynamic
                       and lspec.act_quant)
        static_native = (lspec.act is not None and not lspec.act.dynamic
                         and lspec.act_quant)
        weight_only = lspec.act is None or not lspec.act_quant
        if not (full_native or static_native or weight_only):
            continue
        kernel = flat_p[layer_path + ("kernel",)]
        if kernel.ndim >= 4:  # conv layout [*k, C_in, F] -> 2D view
            kernel = kernel.reshape(-1, kernel.shape[-1])
        # scanned block stacks carry a leading depth axis on every
        # variable: kernel [D, C_in, F], w_delta [D, n_bw, n_tr, 1, F] —
        # the timerange count sits one axis deeper and the slots must be
        # laid out [D, n_tr, ...] to match the scan-lifted declaration
        # (and pack_native_weights' vmap output)
        scanned = kernel.ndim == 3
        wd = flat_q[layer_path + ("w_delta",)]
        n_tr = wd.shape[2] if scanned else wd.shape[1]
        pack4 = (weight_only and lspec.weight.n_bits == 4
                 and not lspec.weight.sym)
        rows = ((kernel.shape[-2] + 1) // 2 if pack4 else kernel.shape[-2])
        F = kernel.shape[-1]
        if scanned:
            D = kernel.shape[0]
            int_shape = (D, n_tr, rows, F)
            cs_shape = (D, n_tr, 1, F)
        else:
            int_shape = (n_tr, rows, F)
            cs_shape = (n_tr, 1, F)
        if layer_path + ("w_int",) not in flat_q:
            flat_q[layer_path + ("w_int",)] = jnp.zeros(int_shape, jnp.int8)
            flat_q[layer_path + ("w_colsum",)] = jnp.zeros(
                cs_shape, jnp.float32)
    return traverse_util.unflatten_dict(flat_q)


def pack_native_weights(params: Dict, quant_vars: Dict,
                        resolve: Callable[[str], Optional[LayerQuantSpec]],
                        tr_only: Optional[int] = None) -> Dict:
    """Fill w_int / w_colsum for every layer that declared them.

    tr_only: pack ONLY this timerange index (the w_int/w_colsum/w_mp_*
    slots must be declared with a length-1 tr axis). Used by the
    static-segment MP sampler to build each union span's slab without ever
    materializing the full [n_tr, rows, F] union stack in HBM — on
    STDiT-XL t20 MP the full stack plus its per-span slices peaked >11 GB
    inside one jit and OOMed a 16 GB v5e."""
    flat_q = traverse_util.flatten_dict(quant_vars)
    flat_p = traverse_util.flatten_dict(params)
    for layer_path in _layer_dirs(quant_vars, "w_int"):
        kernel = jnp.asarray(flat_p[layer_path + ("kernel",)], jnp.float32)
        if kernel.ndim >= 4:  # conv layout [*k, C_in, F] -> 2D view
            kernel = kernel.reshape(-1, kernel.shape[-1])
        scanned = kernel.ndim == 3
        if scanned:
            # scanned stack: each block resolves its own unrolled-style name
            # (per-block bit overrides pack into per-block slab contents)
            specs = resolve_scanned(layer_path, kernel.shape[0], resolve)
        else:
            one = resolve(path_to_dotted(layer_path))
            specs = None if one is None or one.weight is None else [one]
        if specs is None:
            continue
        # the runtime reads w_mp tables iff the MODEL declared the slots
        # (block-0 structure); packing must fill exactly those slots even
        # when a block's own resolved spec disagrees, and must never leave
        # a declared slot at its init value (w_scale=1 → garbage output)
        has_mp_slot = layer_path + ("w_mp_scale",) in flat_q
        n_tr_slab = flat_q[layer_path + ("w_int",)].shape[1 if scanned else 0]
        if tr_only is not None:
            # span slots are length-1 but the mp_bits fill must index the
            # FULL timerange axis (pack reads mp_bits[tr_only])
            wd0 = flat_q[layer_path + ("w_delta",)]
            n_tr_slab = wd0.shape[2 if scanned else 1]

        def norm_spec(s, _has=has_mp_slot, _ntr=n_tr_slab):
            w = s.weight
            if _has and w.mp_bits is None:
                w = dataclasses.replace(w, mp_bits=(w.n_bits,) * _ntr)
            elif not _has and w.mp_bits is not None:
                raise ValueError(
                    f"{path_to_dotted(layer_path)}: resolved spec carries "
                    f"mp_bits but the model declared no w_mp slots — the "
                    f"model and the packing resolver disagree")
            return dataclasses.replace(s, weight=w)

        specs = [norm_spec(s) for s in specs]
        lspec = specs[0]
        wspec = lspec.weight
        smooth = lspec.smooth_quant
        pack4 = ((lspec.act is None or not lspec.act_quant)
                 and wspec.n_bits == 4 and not wspec.sym)
        wd_full = flat_q[layer_path + ("w_delta",)]
        wz_full = flat_q[layer_path + ("w_zp",)]
        # AdaRound: pack with the LEARNED hard rounding (floor + (a >= 0)),
        # not nearest — otherwise the native path silently discards the
        # reconstruction result the simulate path honors (core._int_code
        # learned_hard_sigmoid, soft_targets=False)
        w_alpha = (flat_q.get(layer_path + ("w_alpha",))
                   if wspec.round_mode == "learned_hard_sigmoid" else None)
        if w_alpha is not None and w_alpha.ndim > kernel.ndim:
            w_alpha = w_alpha.reshape(*kernel.shape)
        mp = wspec.mp_bits is not None
        cb_full = flat_q.get(layer_path + ("cb_scale",))
        if scanned:
            acts = flat_q.get(layer_path + ("act_scale",))
            if all(s == lspec for s in specs):
                # uniform specs: vmap the packing over the depth axis
                def pack_one(k, wd, wz, a=None, al=None, c=None):
                    return _pack_layer(k, wd, wz, wspec, smooth, a,
                                       pack4=pack4, w_alpha=al, cb=c,
                                       tr_only=tr_only)

                args = [kernel, wd_full, wz_full]
                in_axes = [0, 0, 0]
                for extra in (acts, w_alpha, cb_full):
                    args.append(extra)
                    in_axes.append(None if extra is None else 0)
                packed = jax.vmap(pack_one, in_axes=tuple(in_axes))(*args)
            else:
                if any(s.weight.mp_bits is None for s in specs):
                    raise ValueError(
                        f"scanned stack {path_to_dotted(layer_path)}: "
                        f"per-block specs differ without w_mp tables — "
                        f"per-block bits under scan need the gather-MP "
                        f"path (mp_bits) or scan_blocks=False")
                per_block = [
                    _pack_layer(kernel[d], wd_full[d], wz_full[d],
                                specs[d].weight, specs[d].smooth_quant,
                                None if acts is None else acts[d],
                                pack4=pack4,
                                w_alpha=None if w_alpha is None
                                else w_alpha[d],
                                cb=None if cb_full is None else cb_full[d],
                                tr_only=tr_only)
                    for d in range(kernel.shape[0])]
                packed = tuple(jnp.stack([pb[i] for pb in per_block])
                               for i in range(len(per_block[0])))
            flat_q[layer_path + ("w_int",)] = packed[0]
            flat_q[layer_path + ("w_colsum",)] = packed[1]
            if mp:
                flat_q[layer_path + ("w_mp_scale",)] = packed[2]
                flat_q[layer_path + ("w_mp_zp",)] = packed[3]
            continue
        act_scale = flat_q.get(layer_path + ("act_scale",))
        packed = _pack_layer(kernel, wd_full, wz_full, wspec, smooth,
                             act_scale, pack4=pack4, w_alpha=w_alpha,
                             cb=cb_full, tr_only=tr_only)
        flat_q[layer_path + ("w_int",)] = packed[0]
        flat_q[layer_path + ("w_colsum",)] = packed[1]
        if mp:
            flat_q[layer_path + ("w_mp_scale",)] = packed[2]
            flat_q[layer_path + ("w_mp_zp",)] = packed[3]
    return traverse_util.unflatten_dict(flat_q)


def _round_codes(w_eff, d, w_alpha):
    """nearest, or AdaRound's learned hard rounding when alphas exist."""
    scaled = w_eff / d
    if w_alpha is None:
        return jnp.round(scaled)
    return jnp.floor(scaled) + (w_alpha >= 0).astype(scaled.dtype)


def _pack_layer(kernel, w_delta, w_zp, wspec, smooth, act_scale,
                pack4: bool = False, w_alpha=None, cb=None,
                tr_only: Optional[int] = None):
    """Quantize one [C_in, F] kernel into per-timerange int slabs + column
    sums. w_delta/w_zp: [n_bw, n_tr, 1, F] (full bit-axis tables). Full-
    native slabs are signed int8 (shifted codes); pack4 slabs hold two
    unsigned 4-bit codes per byte (weight-only int4 — 8x memory vs fp32).

    With wspec.mp_bits set (timerange-gathered mixed precision), timerange
    tr packs at mp_bits[tr] and the return adds the per-range EFFECTIVE
    dequant tables (w_mp_scale, w_mp_zp with the signed shift pre-folded)
    that qlinear gathers by tr_id at run time.

    cb: the layer's calibrated [n_tr, C_in] cs table; preferred over the
    act_scale recompute so packing always matches calibration exactly
    (REQUIRED under SmoothQuantSpec.qkv_share_cs, where cs is pooled
    across sibling kernels)."""
    n_tr = w_delta.shape[1]
    bits_tuple = wspec.bits_tuple
    mp = wspec.mp_bits is not None
    slabs, colsums, mp_scales, mp_zps = [], [], [], []
    trs = range(n_tr) if tr_only is None else (tr_only,)
    for tr in trs:
        bits = wspec.mp_bits[tr] if mp else wspec.n_bits
        bi = bits_tuple.index(bits)
        shift = float(2 ** (bits - 1))
        n_levels = float(2 ** bits)
        w_eff = kernel
        if smooth.enable and "momentum" in smooth.channel_wise_scale_type:
            if cb is not None:
                cs = jnp.asarray(cb[tr])
            else:
                from viditq_tpu.quant import core as _core
                alpha = smooth.alpha_for_range(tr)
                cs = _core.smooth_quant_scale(
                    jnp.asarray(act_scale[tr]),
                    jnp.max(jnp.abs(kernel), axis=-1), alpha)
            w_eff = kernel * cs[:, None]
        # frozen_tr0_weights (reference runtime semantics): every tr slab's
        # codes use TIMERANGE-0's qparams — the per-tr tables are saved but
        # never read by the reference forward (base_quantizer.py:126-134);
        # qlinear._selw dequantizes with the same frozen scale/zp
        w_tr = 0 if (smooth.enable and smooth.frozen_tr0_weights) else tr
        d = jnp.asarray(w_delta[bi, w_tr]).reshape(1, -1)
        z = jnp.asarray(w_zp[bi, w_tr]).reshape(1, -1)
        if wspec.sym:
            # symmetric weights: signed codes, no zero point, no shift
            # (n_levels = 2^(b-1)-1; clamp [-2^(b-1), 2^(b-1)-1] as in
            # base_quantizer.py:137-138)
            code = jnp.clip(_round_codes(w_eff, d, w_alpha), -shift,
                            shift - 1)
            slabs.append(code.astype(jnp.int8))
            colsums.append(jnp.sum(code, axis=0, keepdims=True)
                           .astype(jnp.float32))
            mp_scales.append(d)
            mp_zps.append(jnp.zeros_like(z))
            continue
        code_u = jnp.clip(_round_codes(w_eff, d, w_alpha) + z, 0,
                          n_levels - 1)
        if pack4:
            cin = code_u.shape[0]
            if cin % 2:
                code_u = jnp.pad(code_u, ((0, 1), (0, 0)))
            pairs = code_u.reshape(-1, 2, code_u.shape[-1]).astype(jnp.int32)
            packed = (pairs[:, 0] | (pairs[:, 1] << 4)).astype(jnp.uint8)
            slabs.append(packed.astype(jnp.int8))
            colsums.append(jnp.sum(code_u, axis=0, keepdims=True)
                           .astype(jnp.float32))
        else:
            code = code_u - shift
            slabs.append(code.astype(jnp.int8))
            colsums.append(jnp.sum(code, axis=0, keepdims=True)
                           .astype(jnp.float32))
        mp_scales.append(d)
        mp_zps.append(z - shift)
    out = (jnp.stack(slabs), jnp.stack(colsums))
    if mp:
        out += (jnp.stack(mp_scales), jnp.stack(mp_zps))
    return out
