"""Offline calibration: fill quantizer tables from weights + gathered stats.

The reference initializes quant params *lazily inside forward passes*
(`base_quantizer.py:112-127`, driven by `t2v/scripts/ptq.py:266-361`). On TPU
that pattern (mutating module state mid-trace) doesn't jit, and for weights it
is also unnecessary — weight quant params depend only on the weights and the
(already-gathered) smooth-quant act stats. So the flow becomes:

  1. `mode='sq_stat'` forwards  -> act_scale running stats   (in 'quant')
  2. `calibrate_weight_tables`  -> w_delta/w_zp (+ AdaRound alpha), offline
  3. `mode='a_calib'` forwards  -> a_min/a_max running stats (in 'qstats')
  4. `finalize_act_tables`      -> a_delta/a_zp, offline

Steps 2/4 are pure functions over variable dicts.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

from viditq_tpu.quant import core
from viditq_tpu.quant.spec import LayerQuantSpec


def path_to_dotted(path: Tuple[str, ...]) -> str:
    """Flax variable path -> reference-style dotted layer name.

    List containers are flax-named `blocks_0`, `blocks_1`, ...; the reference
    writes `blocks.0`. Rule: a trailing `_<int>` on a segment is split into
    its own segment. Model code must not name non-list modules with a
    trailing `_<digits>` suffix.
    """
    segs = []
    for p in path:
        base, sep, tail = p.rpartition("_")
        if sep and tail.isdigit():
            segs.extend([base, tail])
        else:
            segs.append(p)
    return ".".join(segs)


SpecResolver = Callable[[str], Optional[LayerQuantSpec]]


def scanned_block_names(layer_path: Tuple[str, ...], depth: int):
    """Per-block resolver-query names for a scanned (stacked) layer.

    Models query the resolver with UNROLLED-style dotted names: a scan
    container's block d is `<container>.<d>.<rest>` (stdit.py scan prefix
    'blocks.0'), or `<base>.<start+d>.<rest>` when the container's dotted
    name carries an integer start offset (PixArt-Σ KV-compress runs,
    container 'blocks_14' -> dotted 'blocks.14'). Offline table fills MUST
    resolve these same names — resolving the raw stacked path ('blocks.
    attn.qkv') silently falls through per-block/per-index override patterns
    and packs the default spec while the runtime reads the override's
    tables (the round-4 W4A8 quality bug)."""
    segs = path_to_dotted(layer_path).split(".")
    if len(segs) > 1 and segs[1].isdigit():
        start = int(segs[1])
        return [".".join([segs[0], str(start + d)] + segs[2:])
                for d in range(depth)]
    return [".".join([segs[0], str(d)] + segs[1:]) for d in range(depth)]


def resolve_scanned(layer_path: Tuple[str, ...], depth: int,
                    resolve: "SpecResolver"):
    """Resolve every block of a scanned layer. Returns the per-block spec
    list, or None when the whole stack is unquantized. A stack whose blocks
    disagree on quantize-or-not cannot be represented by the scan's uniform
    variable structure — that needs the unrolled form."""
    names = scanned_block_names(layer_path, depth)
    specs = [resolve(n) for n in names]
    dead = [s is None or s.weight is None for s in specs]
    if all(dead):
        return None
    if any(dead):
        raise ValueError(
            f"scanned stack {path_to_dotted(layer_path)}: blocks disagree "
            f"on weight quantization (fp blocks "
            f"{[n for n, d in zip(names, dead) if d]}); per-block fp needs "
            f"scan_blocks=False")
    return specs


def _layer_dirs(quant_vars: Dict, leaf: str):
    """Yield (path_tuple, subtree_dict) for every layer dir containing `leaf`."""
    flat = traverse_util.flatten_dict(quant_vars)
    seen = set()
    for path in flat:
        if path[-1] == leaf:
            seen.add(path[:-1])
    return sorted(seen)


def weight_qparams_for_layer(kernel: jnp.ndarray, lspec: LayerQuantSpec,
                             act_scale: Optional[jnp.ndarray] = None
                             ) -> Dict[str, jnp.ndarray]:
    """Compute the full [n_bw, n_tr, 1, F] weight tables for one layer.

    kernel: [C_in, F] (JAX layout). With smooth-quant enabled, the quantized
    weight is `kernel * cs[:, None]` per timerange, where
    cs = act_scale[tr]**alpha / w_absmax**(1-alpha)
    (reference quant_layer.py:136,176-183).
    """
    wspec = lspec.weight
    smooth = lspec.smooth_quant
    n_tr = smooth.n_timerange if smooth.enable else 1
    kernel = kernel.astype(jnp.float32)

    def effective_weight(tr: int) -> jnp.ndarray:
        if not smooth.enable:
            return kernel
        if "momentum" not in smooth.channel_wise_scale_type:
            # dynamic CB: the scale depends on the live activations; the
            # runtime layer computes weight qparams on the fly instead.
            return kernel
        alpha = smooth.alpha_for_range(tr)
        cs = core.smooth_quant_scale(
            act_scale[tr], jnp.max(jnp.abs(kernel), axis=-1), alpha)
        return kernel * cs[:, None]

    deltas, zps = [], []
    for b in wspec.bits_tuple:
        d_tr, z_tr = [], []
        for tr in range(n_tr):
            w_eff = effective_weight(tr)
            d, z = core.compute_qparams(w_eff, wspec, n_bits=b)
            d_tr.append(d)
            z_tr.append(z)
        deltas.append(jnp.stack(d_tr))
        zps.append(jnp.stack(z_tr))
    out = {"w_delta": jnp.stack(deltas), "w_zp": jnp.stack(zps)}
    if wspec.round_mode == "learned_hard_sigmoid":
        # AdaRound alpha from the active bitwidth / first timerange
        d0 = out["w_delta"][wspec.bit_idx, 0]
        out["w_alpha"] = core.adaround_init_alpha(effective_weight(0), d0)
    return out


def calibrate_weight_tables(params: Dict, quant_vars: Dict,
                            resolve: SpecResolver) -> Dict:
    """Fill every layer's w_delta/w_zp (and AdaRound alpha) offline.

    Replaces the reference weight-init forward passes
    (`t2v/scripts/ptq.py:266-293`).
    """
    flat_q = traverse_util.flatten_dict(quant_vars)
    flat_p = traverse_util.flatten_dict(params)
    for layer_path in _layer_dirs(quant_vars, "w_delta"):
        kernel = flat_p[layer_path + ("kernel",)]
        if kernel.ndim >= 4:
            # conv layout [*k, C_in, F] (QuantConv): flatten to the 2D
            # [prod(k)*C_in, F] view the forward uses
            kernel = kernel.reshape(-1, kernel.shape[-1])
        act_scale = flat_q.get(layer_path + ("act_scale",))
        if kernel.ndim == 3:
            # scanned block stack: leading depth axis. Blocks resolve their
            # own (unrolled-style) names — per-block overrides land in the
            # per-block table contents.
            specs = resolve_scanned(layer_path, kernel.shape[0], resolve)
            if specs is None:
                continue
            if all(s == specs[0] for s in specs):
                lspec = specs[0]
                if act_scale is None:
                    tables = jax.vmap(
                        lambda k: weight_qparams_for_layer(k, lspec))(kernel)
                else:
                    tables = jax.vmap(
                        lambda k, a: weight_qparams_for_layer(k, lspec, a))(
                            kernel, act_scale)
            else:
                per_block = [
                    weight_qparams_for_layer(
                        kernel[d], specs[d],
                        None if act_scale is None else act_scale[d])
                    for d in range(kernel.shape[0])]
                tables = {k: jnp.stack([t[k] for t in per_block])
                          for k in per_block[0]}
        else:
            lspec = resolve(path_to_dotted(layer_path))
            if lspec is None or lspec.weight is None:
                continue
            tables = weight_qparams_for_layer(kernel, lspec, act_scale)
        for k, v in tables.items():
            flat_q[layer_path + (k,)] = v

    # smooth-quant balancing scales: cs is a pure function of the kernel +
    # accumulated act_scale stats, so it is materialized per timerange here
    # and the runtime forward gathers it (qlinear 'cb_scale') instead of
    # re-reading the fp32 kernel for an absmax every call. Separate loop:
    # CB also applies to weight-FP layers that carry no w_delta.
    for layer_path in _layer_dirs(quant_vars, "cb_scale"):
        kernel = flat_p[layer_path + ("kernel",)]
        if kernel.ndim >= 4:
            kernel = kernel.reshape(-1, kernel.shape[-1])
        if kernel.ndim == 3:
            cb_specs = [resolve(n) for n in scanned_block_names(
                layer_path, kernel.shape[0])]
        else:
            cb_specs = [resolve(path_to_dotted(layer_path))]
        if any(s is None or not s.smooth_quant.enable
               or "momentum" not in s.smooth_quant.channel_wise_scale_type
               for s in cb_specs):
            continue
        smooth = cb_specs[0].smooth_quant
        if any(s.smooth_quant != smooth for s in cb_specs):
            raise ValueError(
                f"scanned stack {path_to_dotted(layer_path)}: per-block "
                f"smooth-quant configs differ; needs scan_blocks=False")
        act_scale = flat_q[layer_path + ("act_scale",)]

        def cb_for(k, a, _s=smooth):
            w_absmax = jnp.max(jnp.abs(k.astype(jnp.float32)), axis=-1)
            return jnp.stack([
                core.smooth_quant_scale(a[tr], w_absmax,
                                        _s.alpha_for_range(tr))
                for tr in range(_s.n_timerange)])

        flat_q[layer_path + ("cb_scale",)] = (
            jax.vmap(cb_for)(kernel, act_scale) if kernel.ndim == 3
            else cb_for(kernel, act_scale))
    return traverse_util.unflatten_dict(flat_q)


def finalize_act_tables(quant_vars: Dict, qstats: Dict,
                        resolve: SpecResolver) -> Dict:
    """Turn accumulated a_min/a_max running stats into a_delta/a_zp tables.

    Replaces the last `init_quant_params` of each act-init forward
    (`ptq.py:296-361`); only 'min_max' is supported for static acts (all
    reference act configs use min_max).
    """
    flat_q = traverse_util.flatten_dict(quant_vars)
    flat_s = traverse_util.flatten_dict(qstats)
    for layer_path in _layer_dirs(quant_vars, "a_delta"):
        name = path_to_dotted(layer_path)
        lspec = resolve(name)
        if lspec is None or lspec.act is None:
            continue
        aspec = lspec.act
        assert aspec.scale_method == "min_max", \
            "static act calibration supports min_max only"
        a_min = flat_s[layer_path + ("a_min",)]
        a_max = flat_s[layer_path + ("a_max",)]
        deltas, zps = [], []
        for b in aspec.bits_tuple:
            d, z = core.qparams_minmax(a_min, a_max, aspec, n_bits=b)
            deltas.append(d)
            zps.append(z)
        flat_q[layer_path + ("a_delta",)] = jnp.stack(deltas)
        flat_q[layer_path + ("a_zp",)] = jnp.stack(zps)
    return traverse_util.unflatten_dict(flat_q)


def quant_params_dict(quant_vars: Dict) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Pack calibrated tables keyed by dotted layer name — the framework's
    quant-param checkpoint format (reference `get_quant_params_dict`,
    quant_model.py:220-239)."""
    flat = traverse_util.flatten_dict(quant_vars)
    out: Dict[str, Dict[str, jnp.ndarray]] = {}
    for path, val in flat.items():
        out.setdefault(path_to_dotted(path[:-1]), {})[path[-1]] = val
    return out


def load_quant_params_dict(quant_vars: Dict, packed: Dict) -> Dict:
    """Inverse of `quant_params_dict` against an existing variable skeleton
    (reference `set_quant_params_dict`, quant_model.py:242-269)."""
    flat = traverse_util.flatten_dict(quant_vars)
    by_name = {path_to_dotted(p[:-1]): p[:-1] for p in flat}
    for name, tables in packed.items():
        base = by_name.get(name)
        if base is None:
            raise KeyError(f"quant ckpt layer {name} not present in model")
        for k, v in tables.items():
            ref = flat.get(base + (k,))
            if ref is not None and tuple(ref.shape) != tuple(v.shape):
                raise ValueError(
                    f"{name}.{k}: ckpt shape {v.shape} != model {ref.shape}")
            flat[base + (k,)] = jnp.asarray(v)
    return traverse_util.unflatten_dict(flat)
