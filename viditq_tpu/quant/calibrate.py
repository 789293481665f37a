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

import functools
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
                             act_scale: Optional[jnp.ndarray] = None,
                             cb: Optional[jnp.ndarray] = None
                             ) -> Dict[str, jnp.ndarray]:
    """Compute the full [n_bw, n_tr, 1, F] weight tables for one layer.

    kernel: [C_in, F] (JAX layout). With smooth-quant enabled, the quantized
    weight is `kernel * cs[:, None]` per timerange, where
    cs = act_scale[tr]**alpha / w_absmax**(1-alpha)
    (reference quant_layer.py:136,176-183). `cb`: optional precomputed
    [n_tr, C_in] cs table (the layer's calibrated `cb_scale` — REQUIRED
    for qkv_share_cs-pooled layers, whose cs is not a pure function of
    this layer's own kernel).
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
        if cb is not None:
            cs = cb[tr]
        else:
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

    # --- smooth-quant balancing scales FIRST: cs is a pure function of the
    # kernel(s) + accumulated act_scale stats, materialized per timerange
    # here and gathered by the runtime forward (qlinear 'cb_scale') instead
    # of re-reading the fp32 kernel for an absmax every call. Runs before
    # the weight-table loop because pooled layers' w_delta depends on the
    # pooled cs. Separate loop: CB also applies to weight-FP layers that
    # carry no w_delta.
    def _kernel2d(path):
        k = flat_p[path + ("kernel",)]
        if k.ndim >= 4:
            k = k.reshape(-1, k.shape[-1])
        return k

    def _pool_absmax(layer_path, kernel, smooth):
        """Per-channel weight absmax; with qkv_share_cs and this layer being
        a q/k/v sibling, the MAX across the three kernels (the fused-qkv
        granularity of the upstream attention, blocks.py:143)."""
        def absmax(k):
            return jnp.max(jnp.abs(k.astype(jnp.float32)), axis=-1)
        if (not smooth.qkv_share_cs or not layer_path
                or layer_path[-1] not in ("q", "k", "v")):
            return absmax(kernel)
        sibs = [layer_path[:-1] + (n,) for n in ("q", "k", "v")]
        if not all(s + ("kernel",) in flat_p for s in sibs):
            return absmax(kernel)
        return functools.reduce(
            jnp.maximum, [absmax(_kernel2d(s)) for s in sibs])

    for layer_path in _layer_dirs(quant_vars, "cb_scale"):
        if layer_path and layer_path[-1].startswith("cbshare__"):
            continue  # shared-producer copies, filled below
        kernel = _kernel2d(layer_path)
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
        w_absmax = _pool_absmax(layer_path, kernel, smooth)

        def cb_for(wmax, a, _s=smooth):
            return jnp.stack([
                core.smooth_quant_scale(a[tr], wmax, _s.alpha_for_range(tr))
                for tr in range(_s.n_timerange)])

        flat_q[layer_path + ("cb_scale",)] = (
            jax.vmap(cb_for)(w_absmax, act_scale) if kernel.ndim == 3
            else cb_for(w_absmax, act_scale))

    # --- shared-producer cs copies: a leaf named 'cbshare__<rel__path>'
    # at any module dir receives a COPY of that descendant layer's (pooled)
    # cb_scale table, so a parent-scope producer (LN+modulate+quantize /
    # shared qkv prequant) can fold 1/cs without reaching into child scopes.
    flat_all = list(flat_q)
    for path in flat_all:
        leaf = path[-1]
        if not leaf.startswith("cbshare__"):
            continue
        child = path[:-1] + tuple(leaf[len("cbshare__"):].split("__")) \
            + ("cb_scale",)
        src = flat_q.get(child)
        if src is None:
            raise KeyError(
                f"{'.'.join(path)}: no cb_scale at referenced child "
                f"{'.'.join(child)}")
        flat_q[path] = src

    # --- weight quant tables ---
    for layer_path in _layer_dirs(quant_vars, "w_delta"):
        kernel = flat_p[layer_path + ("kernel",)]
        if kernel.ndim >= 4:
            # conv layout [*k, C_in, F] (QuantConv): flatten to the 2D
            # [prod(k)*C_in, F] view the forward uses
            kernel = kernel.reshape(-1, kernel.shape[-1])
        act_scale = flat_q.get(layer_path + ("act_scale",))
        cb = flat_q.get(layer_path + ("cb_scale",))
        if kernel.ndim == 3:
            # scanned block stack: leading depth axis. Blocks resolve their
            # own (unrolled-style) names — per-block overrides land in the
            # per-block table contents.
            specs = resolve_scanned(layer_path, kernel.shape[0], resolve)
            if specs is None:
                continue
            if all(s == specs[0] for s in specs):
                lspec = specs[0]
                args = [kernel]
                in_axes = [0]
                for extra in (act_scale, cb):
                    args.append(extra)
                    in_axes.append(None if extra is None else 0)
                tables = jax.vmap(
                    lambda k, a, c, _l=lspec: weight_qparams_for_layer(
                        k, _l, a, cb=c),
                    in_axes=tuple(in_axes))(*args)
            else:
                per_block = [
                    weight_qparams_for_layer(
                        kernel[d], specs[d],
                        None if act_scale is None else act_scale[d],
                        cb=None if cb is None else cb[d])
                    for d in range(kernel.shape[0])]
                tables = {k: jnp.stack([t[k] for t in per_block])
                          for k in per_block[0]}
        else:
            lspec = resolve(path_to_dotted(layer_path))
            if lspec is None or lspec.weight is None:
                continue
            tables = weight_qparams_for_layer(kernel, lspec, act_scale,
                                              cb=cb)
        for k, v in tables.items():
            flat_q[layer_path + (k,)] = v
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
