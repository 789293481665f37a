"""Quantization-aware Dense layer (flax linen).

TPU-native replacement for the reference's module-swapping `QuantLayer`
machinery (`qdiff/models/quant_layer.py`, `qdiff/models/stdit_quant_layer.py`,
`qdiff/models/quant_model.py:63-103`): instead of walking a built torch model
and swapping `nn.Linear`s, our models are *constructed* with a
`LayerQuantSpec` per linear (resolved by dotted name,
`viditq_tpu.quant.naming`), and all quantizer state lives in two flax
variable collections:

  * 'quant'  — calibrated tables: w_delta/w_zp [n_bw, n_tr, 1, F],
               a_delta/a_zp [n_bw, n_ts, 1, N_tok, 1], act_scale [n_tr, C_in],
               w_alpha (AdaRound).
  * 'qstats' — calibration running state: a_min/a_max/a_init, sq_init.

Dynamic inputs (diffusion timestep, act-table slot) arrive via `QuantCtx`, a
pytree, so the whole sampling loop jits as one `lax.scan`. Per-layer
enables/bitwidths are static (baked into the spec), which lets XLA constant-
fold the quantization structure; timestep-dependent mixed precision is run as
segmented scans with per-segment static configs (SURVEY §7 "hard parts").
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from viditq_tpu.quant import core
from viditq_tpu.quant.spec import LayerQuantSpec, QuantSpec, SmoothQuantSpec

# Calibration / execution modes (static; selects the traced program):
#   'fp'      — plain dense, quantization entirely bypassed
#   'sq_stat' — accumulate smooth-quant act_scale running stats, output FP
#               (reference ptq.py:219-264 stat pass)
#   'a_calib' — accumulate static-act running min/max for the ctx slot, then
#               quantize with the accumulated stats (reference act init
#               forwards, ptq.py:296-361)
#   'quant'   — quantized inference using calibrated tables
MODES = ("fp", "sq_stat", "a_calib", "quant")


@flax.struct.dataclass
class QuantCtx:
    """Dynamic per-step quantization context, threaded through model calls.

    Replaces the reference's mutable `set_timestep_for_quantizer` /
    `cur_timestep_id` stamping (`quant_model.py:158-182,337-360`).
    """

    t_id: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))  # diffusion t in [0,1000]
    act_slot: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))  # act-table slot
    mode: str = flax.struct.field(pytree_node=False, default="quant")
    # AdaRound rounding: hard (alpha >= 0) by default — the reference's
    # inference setting (base_quantizer.py soft_targets=False after recon);
    # reconstruction loops set True to optimize through the soft relaxation.
    soft_targets: bool = flax.struct.field(pytree_node=False, default=False)
    # capture per-layer inputs/outputs into the 'intermediates' collection
    # (the functional analog of the reference's forward hooks,
    # qdiff/utils.py:72,446 DataSaverHook / GetLayerInOut) — used by
    # sweep-alpha, smooth-quant-list and AdaRound data collection.
    capture: bool = flax.struct.field(pytree_node=False, default=False)
    # STATIC timerange pin: when a sampler segment runs entirely inside one
    # smooth-quant timerange (mixed_precision.build_mp_sampler static
    # mode), setting this compile-time constant folds every per-timerange
    # dynamic_index gather (weight slabs, cb/act tables) into a static
    # slice — XLA reads the slab in place instead of copying it per step.
    tr_static: Optional[int] = flax.struct.field(pytree_node=False,
                                                 default=None)
    rng: Optional[jnp.ndarray] = None


def shared_prequant(x: jnp.ndarray, lspec: Optional[LayerQuantSpec],
                    col_scale: Optional[jnp.ndarray] = None):
    """Quantize an input ONCE for reuse across sibling native linears
    (q/k/v share their input; per-token scales are identical regardless of
    which sibling computes them).

    Smooth-quant layers need the 1/cs act rescale BEFORE the quantize —
    per layer in general, so CB disables sharing UNLESS the caller passes
    `col_scale` (the shared inv-cs of SmoothQuantSpec.qkv_share_cs-pooled
    siblings, gathered by timerange). Returns None when the spec isn't
    representable as one shared pass."""
    if (lspec is None or lspec.backend != "native" or lspec.act is None
            or not lspec.act.dynamic or not lspec.act_quant
            or not lspec.weight_quant
            or (lspec.smooth_quant.enable and col_scale is None)):
        return None
    if lspec.impl == "fused":
        from viditq_tpu.kernels.fused_matmul import (fused_available,
                                                     quantize_rows_fused)
        if fused_available():
            q, xs, xzp, xrs = quantize_rows_fused(
                x.reshape(-1, x.shape[-1]), sym=lspec.act.sym,
                need_rowsum=not (lspec.weight is not None
                                 and lspec.weight.sym),
                col_scale=col_scale)
            return q, xs, xzp, xrs
    from viditq_tpu.kernels.int_matmul import dynamic_quant_rows_ref
    x2 = x.reshape(-1, x.shape[-1])
    if col_scale is not None:
        x2 = (x2.astype(jnp.float32)
              * col_scale.reshape(1, -1)).astype(x2.dtype)
    return dynamic_quant_rows_ref(x2, sym=lspec.act.sym)


def cbshare_inv_cs(module, child_rel: str,
                   lspec: Optional[LayerQuantSpec],
                   qctx: Optional[QuantCtx], n_in: int):
    """Declare (in `module`'s scope) and gather the shared smooth-quant
    inverse balancing scale of the child layer at dotted `child_rel`.

    The variable is a COPY of that child's calibrated `cb_scale` table —
    `calibrate_weight_tables` fills any quant leaf named
    'cbshare__<rel__path>' from `<rel.path>.cb_scale` — so parent-scope
    producers (the block's LN+modulate+quantize, the attention's shared
    q/k/v prequant) can fold 1/cs without reaching into child variable
    scopes. Declaration depends only on the STATIC spec (so init and
    apply agree); the gather returns None outside quant mode."""
    if lspec is None:
        return None
    smooth = lspec.smooth_quant
    if not (smooth.enable and "momentum" in smooth.channel_wise_scale_type
            and lspec.backend == "native" and lspec.act is not None
            and lspec.act.dynamic and lspec.act_quant and lspec.weight_quant):
        return None
    var = module.variable(
        "quant", "cbshare__" + child_rel.replace(".", "__"),
        lambda: jnp.zeros((smooth.n_timerange, n_in), jnp.float32))
    if qctx is None or qctx.mode != "quant":
        return None
    if smooth.n_timerange == 1:
        cs = var.value[0]
    else:
        tr_id = resolve_tr_id(smooth, qctx)
        cs = jax.lax.dynamic_index_in_dim(var.value, tr_id, 0, False)
    # uncalibrated rows are 0: treat as identity (matches qlinear's gather)
    cs = jnp.where(cs > 0, cs, 1.0)
    return 1.0 / cs


def resolve_tr_id(smooth: SmoothQuantSpec,
                  qctx: Optional[QuantCtx]) -> jnp.ndarray:
    """Timerange id for this call: the static pin when the qctx carries
    one (constant-folds downstream gathers), else the dynamic lookup of
    qctx.t_id through the timerange table."""
    if qctx is not None and qctx.tr_static is not None:
        return jnp.asarray(qctx.tr_static, jnp.int32)
    tr_map = jnp.asarray(timerange_lookup(smooth))
    return tr_map[jnp.clip(qctx.t_id, 0, 1000)]


def timerange_lookup(smooth: SmoothQuantSpec) -> np.ndarray:
    """Static [1001] map: diffusion timestep -> timerange index.

    Replaces the reference's per-forward python `find_interval`
    (quant_layer.py:15-19) with a constant gather table.
    """
    table = np.zeros(1001, np.int32)
    for i, (lo, hi) in enumerate(smooth.timerange):
        table[lo:hi + 1] = i
    return table


def _abs_max_per_channel(x: jnp.ndarray) -> jnp.ndarray:
    """mean over leading dims of (max |x| over the token axis) -> [C].

    Reference smooth-quant act stat: `input.abs().max(dim=-2)[0].mean(dim=0)`
    (quant_layer.py:117,120).
    """
    m = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-2)
    return jnp.mean(m.reshape(-1, m.shape[-1]), axis=0)


class QuantLinear(nn.Module):
    """Dense layer with optional fake/int quantization of weights and acts.

    `token_layout` controls the logical [B, N_token, C] view used for
    token-wise activation quantization (reference stdit_quant_layer.py):
      None / 'cross_q' — input already [..., N, C]
      'spatial'   — input [(B T), S, C] viewed as [B, T*S, C]
      'temporal'  — input [(B S), T, C] viewed as [B, S*T, C]
      'cross_kv'  — input [1, B*P, C] viewed as [B, P, C]
    """

    features: int
    lspec: Optional[LayerQuantSpec] = None
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    token_layout: Optional[str] = None
    d_t: int = 1          # temporal tokens (spatial/temporal layouts)
    d_s: int = 1          # spatial tokens
    n_prompt: int = 120   # prompt tokens (cross_kv layout)
    # Reference call-site layout for layout-SENSITIVE statistics (the
    # smooth-quant stat max(dim=-2).mean(dim=0), quant_layer.py:120). Our
    # packed temporal attention feeds [B, (S T), C] where the reference
    # feeds [(B S), T, C] — identical per-token scale sets, different
    # max/mean decomposition. seg_len>0 restores the reference view by
    # splitting the token axis; stat_layout='packed_prompt' restores the
    # reference's [1, B*P, C] xformers-packed prompt view from dense
    # [B, P, C] (blocks.py:283-301).
    seg_len: int = 0
    stat_layout: Optional[str] = None
    kernel_init: Any = nn.initializers.xavier_uniform()
    bias_init: Any = nn.initializers.zeros_init()

    def _to_token_view(self, x, dynamic: bool = False):
        """[B, n_token, C] view for token-wise act quantization. Token-wise
        scales are pooled per token POSITION over (batch x channels)
        (base_quantizer.py:177-185: x.permute([1,0,2]).reshape([n_token,-1])),
        so the batch split of this view is semantic. cross_kv DYNAMIC
        quantization runs on the reference's xformers-packed [1, B*P, C]
        view — per-(batch, prompt) scales — while the static table path
        reshapes to [B, P, C] (stdit_quant_layer.py:266-279)."""
        if self.token_layout == "spatial":
            b = x.shape[0] // self.d_t
            return x.reshape(b, self.d_t * self.d_s, x.shape[-1])
        if self.token_layout == "temporal":
            b = x.shape[0] // self.d_s
            return x.reshape(b, self.d_s * self.d_t, x.shape[-1])
        if self.token_layout == "cross_kv":
            if dynamic:
                return x.reshape(1, -1, x.shape[-1])
            # static tables: the dense [B, P, C] view (our models feed the
            # kv linear dense prompts; a packed [1, B*P, C] input is
            # unpacked back to batch rows)
            if x.shape[-2] == self.n_prompt:
                return x
            b = x.shape[-2] // self.n_prompt
            return x.reshape(b, self.n_prompt, x.shape[-1])
        return x

    def _from_token_view(self, x, orig_shape):
        return x.reshape(orig_shape)

    def _to_stat_view(self, x):
        """Reference call-site layout for smooth-quant stats (see the
        seg_len/stat_layout field note)."""
        if self.seg_len > 0:
            return x.reshape(-1, self.seg_len, x.shape[-1])
        if self.stat_layout == "packed_prompt":
            return x.reshape(1, -1, x.shape[-1])
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray, qctx: Optional[QuantCtx] = None,
                 prequant=None, epilogue=None, emit=None):
        """`prequant`: optional (x_q int8 [M,K], scale, zp, rowsum) computed
        once by the parent for an input shared across sibling linears
        (q/k/v) — saves the redundant per-linear dynamic-quant passes in the
        native path. `epilogue`: optional (residual, gate) fused residual
        add (see _quant_forward). `emit`: optional {'gelu', 'col_scale'} —
        the fused-consumer path returns (codes int8 [M, features],
        group scales [M, G], None, None) from an int8-emitting epilogue
        instead of a bf16 output (the caller feeds it to the next linear
        as a group-wise prequant; see models/layers.Mlp). Only valid on
        the prequant+fused native path in quant mode."""
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        return self._quant_forward(x, kernel, bias, qctx, prequant,
                                   epilogue, emit)

    def _epilogue_fusable(self, qctx) -> bool:
        """Whether the residual(+gate) epilogue runs inside the fused int8
        matmul kernel (vs the XLA fallback applied after).

        DEFAULT OFF: measured a net LOSS on v5e (fused-allsym block 11.49 ->
        12.6-12.7 ms — the residual stream's extra VMEM buffers stall the
        matmul pipeline more than the saved HBM round trip of the raw
        projection output; XLA already fuses the external residual add into
        neighboring elementwise passes). Set VIDITQ_FUSE_EPILOGUE=1 to
        re-enable for tuning on other TPU generations."""
        import os
        if os.environ.get("VIDITQ_FUSE_EPILOGUE", "0") != "1":
            return False
        lspec = self.lspec
        if (qctx is None or qctx.mode != "quant" or qctx.capture
                or lspec is None or lspec.backend != "native"
                or lspec.impl != "fused" or lspec.act is None
                or not lspec.act.dynamic or not lspec.act_quant
                or not lspec.weight_quant or lspec.smooth_quant.enable
                or lspec.split):
            return False
        from viditq_tpu.kernels.fused_matmul import fused_available
        return fused_available()

    def _quant_forward(self, x: jnp.ndarray, kernel: jnp.ndarray, bias,
                       qctx: Optional[QuantCtx], prequant=None,
                       epilogue=None, emit=None):
        """The full quant pipeline over a 2D kernel [K, features] and inputs
        [..., K] — shared by QuantLinear and (via im2col) QuantConv.

        `epilogue`: optional (residual, gate) with residual shaped like the
        output and gate [G, features] (G batches, rows split evenly) — the
        caller's residual add `res + gate * out` fuses into the int8 matmul
        epilogue on the fused-native path (no HBM round trip of the raw
        projection output), and is applied identically in XLA otherwise."""
        if emit is not None:
            assert epilogue is None, "emit replaces the output epilogue"
            return self._quant_core(x, kernel, bias, qctx, prequant,
                                    None, emit)
        fused_epi = epilogue is not None and self._epilogue_fusable(qctx)
        out = self._quant_core(x, kernel, bias, qctx, prequant,
                               epilogue if fused_epi else None)
        if (qctx is not None and qctx.capture and qctx.mode != "fp"
                and not fused_epi):
            # pre-residual output (the fp-mode sow lives in _quant_core) —
            # comparable to the reference QuantLayer forward-hook output
            self.sow("intermediates", "output", out)
        if epilogue is not None and not fused_epi:
            res, gate = epilogue
            if gate is not None:
                G, F = gate.shape
                o2 = out.reshape(G, -1, F)
                out = (res.reshape(o2.shape)
                       + gate[:, None].astype(o2.dtype) * o2
                       ).reshape(out.shape).astype(out.dtype)
            else:
                out = (res.reshape(out.shape) + out).astype(out.dtype)
        return out

    def _quant_core(self, x: jnp.ndarray, kernel: jnp.ndarray, bias,
                    qctx: Optional[QuantCtx], prequant=None,
                    epilogue=None, emit=None):
        in_features = kernel.shape[0]
        lspec = self.lspec
        if emit is not None and (lspec is None or qctx is None
                                 or qctx.mode != "quant" or prequant is None
                                 or lspec.backend != "native"
                                 or lspec.impl != "fused"):
            raise ValueError(
                "emit requires the fused-native consumer path in quant "
                "mode (the caller's gate must mirror the dispatch)")
        if lspec is None or (not lspec.weight_quant and not lspec.act_quant
                             and not lspec.smooth_quant.enable):
            return self._dense(x, kernel, bias)

        smooth = lspec.smooth_quant
        wspec, aspec = lspec.weight, lspec.act
        n_tr = smooth.n_timerange if smooth.enable else 1

        # ---- declare quantizer state (shapes are static) ----
        w_q = None
        if wspec is not None and lspec.weight_quant:
            wshape = (wspec.n_bitwidth, n_tr, 1, self.features)
            w_delta = self.variable("quant", "w_delta",
                                    lambda: jnp.full(wshape, -1.0, jnp.float32))
            w_zp = self.variable("quant", "w_zp",
                                 lambda: jnp.full(wshape, -1.0, jnp.float32))
            w_q = (w_delta, w_zp)
            w_alpha = None
            if wspec.round_mode == "learned_hard_sigmoid":
                w_alpha = self.variable(
                    "quant", "w_alpha",
                    lambda: jnp.zeros((in_features, self.features), jnp.float32))

        if lspec.backend == "native":
            if smooth.enable and smooth.channel_wise_scale_type == "dynamic":
                # native weight slabs are packed OFFLINE; a per-forward
                # dynamic balancing scale cannot be folded into them — the
                # output would silently be off by cs per channel (the
                # momentum types fold the converged act_scale at pack time)
                raise ValueError(
                    "backend='native' requires a momentum smooth-quant "
                    "scale type (packed weight slabs can't track per-"
                    "forward dynamic channel balancing); use "
                    "backend='simulate' for channel_wise_scale_type="
                    "'dynamic'")
            if lspec.split:
                # q-diffusion channel splitting keeps two quantizer groups
                # per layer — only the simulate path implements it
                # (spec.py: 'Simulate backend only')
                raise ValueError(
                    "backend='native' does not implement q-diffusion "
                    "channel split (split>0); use backend='simulate'")
        # full native: int8 act x int8 weight on the MXU
        native = (lspec.backend == "native" and w_q is not None
                  and aspec is not None and aspec.dynamic and lspec.act_quant)
        # static-act native: per-token scales come from calibrated tables, so
        # quantization is pure elementwise (XLA fuses it into the producer —
        # no extra activation pass). With symmetric weights the rowsum
        # correction also vanishes: this is the fastest int8 path on v5e
        # (BENCH_NOTES.md; the reference's w8a8_naive/static plans).
        native_static = (lspec.backend == "native" and w_q is not None
                         and aspec is not None and not aspec.dynamic
                         and lspec.act_quant and lspec.weight_quant
                         and aspec.n_bits <= 8)
        # weight-only native: int8-stored weights dequantized into a bf16
        # matmul — all of the 4x weight-memory win with none of the
        # dynamic-quant/epilogue overhead (see BENCH_NOTES.md: int8 compute
        # carries no rate advantage on v5e, so this is often the fastest
        # quantized mode)
        native_wo = (lspec.backend == "native" and w_q is not None
                     and lspec.weight_quant
                     and (aspec is None or not lspec.act_quant))
        # int4 weight-only weights bit-pack two codes per byte (8x memory
        # reduction vs fp32); full-native stays one code per int8 byte
        # (the MXU consumes int8). Symmetric int4 weights stay unpacked:
        # their codes are signed and the nibble packing is unsigned.
        pack4 = (native_wo and wspec is not None and wspec.n_bits == 4
                 and not wspec.sym)
        if native or native_wo or native_static:
            # prepacked int weights + column sums, filled offline by
            # viditq_tpu.quant.native_pack.pack_native_weights
            rows = (in_features + 1) // 2 if pack4 else in_features
            w_int = self.variable(
                "quant", "w_int",
                lambda: jnp.zeros((n_tr, rows, self.features), jnp.int8))
            w_colsum = self.variable(
                "quant", "w_colsum",
                lambda: jnp.zeros((n_tr, 1, self.features), jnp.float32))
        w_mp = None
        if (native or native_static) and wspec.mp_bits is not None:
            # timerange-gathered MP: per-range bits -> per-range EFFECTIVE
            # dequant tables (scale, zp with the signed-shift pre-folded),
            # filled by pack_native_weights alongside the per-range slabs.
            # One gather by tr_id replaces the reference's per-step mutable
            # bitwidth flip (gaussian_diffusion.py:740-767) — the whole MP
            # sampler stays a single compiled scan.
            if len(wspec.mp_bits) != n_tr:
                raise ValueError(
                    f"mp_bits length {len(wspec.mp_bits)} != n_timerange "
                    f"{n_tr} (mp_bits are per smooth-quant timerange)")
            w_mp = (
                self.variable(
                    "quant", "w_mp_scale",
                    lambda: jnp.ones((n_tr, 1, self.features), jnp.float32)),
                self.variable(
                    "quant", "w_mp_zp",
                    lambda: jnp.zeros((n_tr, 1, self.features), jnp.float32)))

        act_scale = None
        cb_scale = None
        if smooth.enable:
            act_scale = self.variable(
                "quant", "act_scale",
                lambda: jnp.zeros((n_tr, in_features), jnp.float32))
            sq_init = self.variable(
                "qstats", "sq_init", lambda: jnp.zeros((n_tr,), jnp.bool_))
            if "momentum" in smooth.channel_wise_scale_type:
                # precomputed per-timerange balancing scale cs (filled by
                # calibrate_weight_tables): the runtime forward gathers it
                # instead of re-deriving cs from a full fp32-kernel absmax
                # every call — on the native backend that read was the only
                # remaining per-step traffic over the fp32 weights
                cb_scale = self.variable(
                    "quant", "cb_scale",
                    lambda: jnp.zeros((n_tr, in_features), jnp.float32))

        a_static = (aspec is not None and lspec.act_quant
                    and not aspec.dynamic)
        if a_static:
            # group shape from the token view of x
            xv_shape = self._to_token_view(x).shape
            gshape = core.group_shape_of(xv_shape, aspec)
            gshape = (1,) + gshape[1:]  # batch-agnostic
            ashape = (aspec.n_bitwidth, aspec.n_timestep) + gshape
            a_delta = self.variable("quant", "a_delta",
                                    lambda: jnp.full(ashape, -1.0, jnp.float32))
            a_zp = self.variable("quant", "a_zp",
                                 lambda: jnp.full(ashape, -1.0, jnp.float32))
            sshape = (aspec.n_timestep,) + gshape
            a_min = self.variable("qstats", "a_min",
                                  lambda: jnp.zeros(sshape, jnp.float32))
            a_max = self.variable("qstats", "a_max",
                                  lambda: jnp.zeros(sshape, jnp.float32))
            a_init = self.variable("qstats", "a_init",
                                   lambda: jnp.zeros((aspec.n_timestep,), jnp.bool_))

        if qctx is not None and qctx.capture:
            self.sow("intermediates", "input", x)
        if qctx is None or qctx.mode == "fp":
            out = self._dense(x, kernel, bias)
            if qctx is not None and qctx.capture:
                self.sow("intermediates", "output", out)
            return out
        mode = qctx.mode
        assert mode in MODES, mode

        # ---- timerange id (dynamic gather over a static table, or the
        # qctx's compile-time pin — resolve_tr_id) ----
        if smooth.enable:
            tr_id = resolve_tr_id(smooth, qctx)
        else:
            tr_id = jnp.zeros((), jnp.int32)

        # ---- smooth-quant stat accumulation pass ----
        if mode == "sq_stat":
            if smooth.enable and "momentum" in smooth.channel_wise_scale_type:
                cur = _abs_max_per_channel(self._to_stat_view(x))
                old = jax.lax.dynamic_index_in_dim(
                    act_scale.value, tr_id, 0, keepdims=False)
                inited = jax.lax.dynamic_index_in_dim(
                    sq_init.value, tr_id, 0, keepdims=False)
                blended = jnp.where(
                    inited, old * smooth.momentum + cur * (1 - smooth.momentum),
                    cur)
                act_scale.value = jax.lax.dynamic_update_index_in_dim(
                    act_scale.value, blended[None], tr_id, 0)
                sq_init.value = jax.lax.dynamic_update_index_in_dim(
                    sq_init.value, jnp.ones((1,), jnp.bool_), tr_id, 0)
            return self._dense(x, kernel, bias)

        # ---- channel-balancing scale (quant_layer.py:108-140) ----
        cs = None
        fold_cs = None
        if smooth.enable:
            if smooth.channel_wise_scale_type == "dynamic":
                alphas = jnp.asarray(
                    [smooth.alpha_for_range(i) for i in range(n_tr)],
                    jnp.float32)
                w_absmax = jnp.max(jnp.abs(kernel.astype(jnp.float32)),
                                   axis=-1)
                a_absmax = _abs_max_per_channel(self._to_stat_view(x))
                cs = core.smooth_quant_scale(a_absmax, w_absmax,
                                             alphas[tr_id])
            else:
                # momentum types: cs is a pure function of calibrated state
                # — gather the precomputed per-tr table (uncalibrated rows
                # are 0; treat as identity so smoke paths stay finite)
                cs = jax.lax.dynamic_index_in_dim(
                    cb_scale.value, tr_id, 0, keepdims=False)
                cs = jnp.where(cs > 0, cs, 1.0)
            if (native and mode == "quant" and prequant is None
                    and lspec.impl == "fused"):
                from viditq_tpu.kernels.fused_matmul import fused_available
                if fused_available():
                    # the 1/cs rescale folds into the fused matmul's
                    # in-kernel quantize — no standalone [M, K] pass
                    fold_cs = 1.0 / cs
            if fold_cs is None and prequant is None:
                # (prequant inputs arrive already rescaled — either by the
                # producer's col_scale fold or the attention emit kernel)
                x = (x.astype(jnp.float32) / cs).astype(x.dtype)

        # ---- native int8 execution path ----
        if native and mode == "quant":
            if aspec.n_bits != 8:
                # the dynamic-quant kernels hard-code int8 code ranges
                # (int_matmul.dynamic_quant_rows); sub-8-bit native acts
                # would silently run as A8
                raise ValueError(
                    f"native dynamic-act backend requires 8-bit acts, got "
                    f"{aspec.n_bits}; use backend='simulate' for A<8")
            from viditq_tpu.kernels.int_matmul import (
                int8_matmul_ref, quantized_linear_native)

            def _sel(v):
                if n_tr == 1:
                    return v[0]
                return jax.lax.dynamic_index_in_dim(v, tr_id, 0, False)

            def _selw(v):
                # weight-TABLE selection: frozen at timerange 0 under the
                # reference's runtime semantics (base_quantizer.py:126-134;
                # SmoothQuantSpec.frozen_tr0_weights) — the int slabs stay
                # per-tr (cs(tr) changes the codes) but their scale/zp don't
                if n_tr > 1 and smooth.enable and smooth.frozen_tr0_weights:
                    return v[0]
                return _sel(v)

            # asym weight codes are stored shifted into signed int8; sym
            # codes are natively signed with zero point 0
            shift = 0.0 if wspec.sym else float(2 ** (wspec.n_bits - 1))
            if w_mp is not None:
                # per-range bits: gather the pre-folded effective tables
                packed = {
                    "w_q": _sel(w_int.value),
                    "w_colsum": _sel(w_colsum.value).reshape(1, -1),
                    "w_scale": _sel(w_mp[0].value).reshape(1, -1),
                    "w_zp": _sel(w_mp[1].value).reshape(1, -1),
                }
            else:
                packed = {
                    "w_q": _sel(w_int.value),
                    "w_colsum": _sel(w_colsum.value).reshape(1, -1),
                    "w_scale": _selw(w_q[0].value[wspec.bit_idx])
                    .reshape(1, -1),
                    "w_zp": (_selw(w_q[1].value[wspec.bit_idx])
                             .reshape(1, -1) - shift),
                }
            if prequant is not None:
                x_qv, xs, xzp, xrs = prequant
                from viditq_tpu.kernels.fused_matmul import fused_available
                if lspec.impl == "fused" and fused_available():
                    from viditq_tpu.kernels.fused_matmul import \
                        int8_consumer_matmul
                    if emit is not None:
                        # int8-emitting epilogue: (codes, group scales) for
                        # the NEXT consumer — the bf16 output never exists
                        codes, scales = int8_consumer_matmul(
                            x_qv, xs, packed["w_q"], packed["w_scale"],
                            x_zp=xzp, x_rowsum=xrs,
                            w_zp=None if wspec.sym else packed["w_zp"],
                            w_colsum=packed["w_colsum"],
                            bias=bias, out_dtype=self.dtype, emit=emit)
                        return codes, scales, None, None
                    res2 = gate2 = None
                    if epilogue is not None:
                        res2 = epilogue[0].reshape(-1, self.features)
                        gate2 = epilogue[1]
                    out = int8_consumer_matmul(
                        x_qv, xs, packed["w_q"], packed["w_scale"],
                        x_zp=xzp, x_rowsum=xrs,
                        w_zp=None if wspec.sym else packed["w_zp"],
                        w_colsum=packed["w_colsum"],
                        bias=bias, out_dtype=self.dtype,
                        residual=res2, gate=gate2)
                    return out.reshape(*x.shape[:-1], self.features)
                if emit is not None:
                    raise ValueError(
                        "emit requires the fused consumer kernel "
                        "(fused_available() was false at dispatch)")
                out = int8_matmul_ref(
                    x_qv, packed["w_q"], xs, xzp, xrs, packed["w_scale"],
                    packed["w_zp"], packed["w_colsum"],
                    out_dtype=self.dtype)
                if bias is not None:
                    out = out + bias.astype(self.dtype)
                return out.reshape(*x.shape[:-1], self.features)
            xv = self._to_token_view(x)
            res2 = gate2 = None
            if epilogue is not None:
                res2 = epilogue[0].reshape(-1, self.features)
                gate2 = epilogue[1]
            out = quantized_linear_native(xv, packed, bias=bias,
                                          act_sym=aspec.sym,
                                          w_sym=wspec.sym,
                                          out_dtype=self.dtype,
                                          impl=lspec.impl,
                                          residual=res2, gate=gate2,
                                          col_scale=fold_cs)
            return out.reshape(*x.shape[:-1], self.features)

        if native_static and mode == "quant":
            from viditq_tpu.kernels.int_matmul import int8_matmul_ref

            def _sel(v):
                if n_tr == 1:
                    return v[0]
                return jax.lax.dynamic_index_in_dim(v, tr_id, 0, False)

            def _selw(v):
                # weight-TABLE selection: frozen at timerange 0 under the
                # reference's runtime semantics (base_quantizer.py:126-134;
                # SmoothQuantSpec.frozen_tr0_weights) — the int slabs stay
                # per-tr (cs(tr) changes the codes) but their scale/zp don't
                if n_tr > 1 and smooth.enable and smooth.frozen_tr0_weights:
                    return v[0]
                return _sel(v)

            shift_w = 0.0 if wspec.sym else float(2 ** (wspec.n_bits - 1))
            if w_mp is not None:
                packed = {
                    "w_q": _sel(w_int.value),
                    "w_colsum": _sel(w_colsum.value).reshape(1, -1),
                    "w_scale": _sel(w_mp[0].value).reshape(1, -1),
                    "w_zp": _sel(w_mp[1].value).reshape(1, -1),
                }
            else:
                packed = {
                    "w_q": _sel(w_int.value),
                    "w_colsum": _sel(w_colsum.value).reshape(1, -1),
                    "w_scale": _selw(w_q[0].value[wspec.bit_idx])
                    .reshape(1, -1),
                    "w_zp": (_selw(w_q[1].value[wspec.bit_idx])
                             .reshape(1, -1) - shift_w),
                }
            # per-token act params from the calibrated table slot
            d_a = jax.lax.dynamic_index_in_dim(
                a_delta.value[aspec.bit_idx], qctx.act_slot, 0, False)
            z_a = jax.lax.dynamic_index_in_dim(
                a_zp.value[aspec.bit_idx], qctx.act_slot, 0, False)
            xv = self._to_token_view(x).astype(jnp.float32)
            n_levels_a = aspec.n_levels()
            shift_a = float(2 ** (aspec.n_bits - 1))
            inv_d = 1.0 / d_a  # reciprocal multiply, not an [M, K] division
            if aspec.sym:
                codes = jnp.clip(jnp.round(xv * inv_d), -n_levels_a - 1,
                                 n_levels_a)
                zp_rows = jnp.zeros_like(d_a)
            else:
                codes = jnp.clip(jnp.round(xv * inv_d) + z_a, 0,
                                 n_levels_a - 1) - shift_a
                zp_rows = z_a - shift_a
            Bv, Nv, Cv = xv.shape
            x_q = codes.astype(jnp.int8).reshape(-1, Cv)
            xs = jnp.broadcast_to(d_a, (Bv, Nv, 1)).reshape(-1, 1)
            xzp = jnp.broadcast_to(zp_rows, (Bv, Nv, 1)).reshape(-1, 1)
            if wspec.sym:
                xrs = jnp.zeros_like(xs)  # w_zp == 0: rowsum term vanishes
            else:
                xrs = jnp.sum(codes, axis=-1, keepdims=True
                              ).reshape(-1, 1).astype(jnp.float32)
            from viditq_tpu.kernels.fused_matmul import fused_available
            if lspec.impl == "fused" and fused_available():
                # the quantize stays an XLA elementwise pass (fuses into the
                # producer); the matmul runs the Pallas consumer kernel
                # (349 vs 280 TOPS for the XLA int8 dot at DiT shapes)
                from viditq_tpu.kernels.fused_matmul import \
                    int8_consumer_matmul
                both_sym = aspec.sym and wspec.sym
                out = int8_consumer_matmul(
                    x_q, xs,
                    packed["w_q"], packed["w_scale"],
                    x_zp=None if aspec.sym else xzp,
                    x_rowsum=None if both_sym else xrs,
                    w_zp=None if wspec.sym else packed["w_zp"],
                    w_colsum=packed["w_colsum"],
                    bias=bias, out_dtype=self.dtype)
                return out.reshape(*x.shape[:-1], self.features)
            out = int8_matmul_ref(x_q, packed["w_q"], xs, xzp, xrs,
                                  packed["w_scale"], packed["w_zp"],
                                  packed["w_colsum"], out_dtype=self.dtype)
            if bias is not None:
                out = out + bias.astype(self.dtype)
            return out.reshape(*x.shape[:-1], self.features)

        if native_wo and mode == "quant":
            def _sel(v):
                if n_tr == 1:
                    return v[0]
                return jax.lax.dynamic_index_in_dim(v, tr_id, 0, False)

            def _selw(v):
                # weight-TABLE selection: frozen at timerange 0 under the
                # reference's runtime semantics (base_quantizer.py:126-134;
                # SmoothQuantSpec.frozen_tr0_weights) — the int slabs stay
                # per-tr (cs(tr) changes the codes) but their scale/zp don't
                if n_tr > 1 and smooth.enable and smooth.frozen_tr0_weights:
                    return v[0]
                return _sel(v)

            d = _selw(w_q[0].value[wspec.bit_idx]).reshape(1, -1)
            z = _selw(w_q[1].value[wspec.bit_idx]).reshape(1, -1)
            stored = _sel(w_int.value)
            if pack4:
                # two unsigned 4-bit codes per byte, row-interleaved
                b = stored.astype(jnp.int32) & 0xFF
                lo = (b & 0x0F).astype(self.dtype)
                hi = ((b >> 4) & 0x0F).astype(self.dtype)
                codes = jnp.stack([lo, hi], axis=1).reshape(
                    -1, self.features)[:in_features]
                w_deq = (codes - z.astype(self.dtype)) * d.astype(self.dtype)
            else:
                # sym slabs store UNSHIFTED signed codes with zp=0
                # (native_pack._pack_layer sym branch); only asym codes are
                # shifted into signed int8.
                shift = 0.0 if wspec.sym else float(2 ** (wspec.n_bits - 1))
                codes = stored.astype(self.dtype)
                w_deq = ((codes - (z.astype(self.dtype) - shift))
                         * d.astype(self.dtype))
            return self._dense(x, w_deq, bias)

        # ---- q-diffusion legacy channel split (quant_layer.py:159-172):
        # separate quantizer groups for input channels [:split] / [split:],
        # on-the-fly qparams, simulate backend only ----
        if lspec.split > 0 and mode == "quant":
            s = lspec.split
            xa, xb = x[..., :s], x[..., s:]
            if aspec is not None and lspec.act_quant:
                xa = core.fake_quant_dynamic(xa, aspec)
                xb = core.fake_quant_dynamic(xb, aspec)
            x = jnp.concatenate([xa, xb], axis=-1)
            w_eff = kernel.astype(jnp.float32)
            if wspec is not None and lspec.weight_quant:
                parts = []
                for wpart in (w_eff[:s], w_eff[s:]):
                    d, z = core.compute_qparams(wpart, wspec)
                    parts.append(core.fake_quant(wpart, d, z, wspec))
                w_eff = jnp.concatenate(parts, axis=0)
            return self._dense(x, w_eff.astype(self.param_dtype), bias)

        # ---- activation quantization ----
        if aspec is not None and lspec.act_quant:
            orig_shape = x.shape
            xv = self._to_token_view(x, dynamic=aspec.dynamic)
            if aspec.dynamic:
                xv = core.fake_quant_dynamic(xv, aspec)
            elif mode == "a_calib":
                slot = qctx.act_slot
                cmin, cmax = core.minmax(xv, aspec)
                cmin, cmax = cmin[0], cmax[0]  # drop batch dim -> group shape
                omin = jax.lax.dynamic_index_in_dim(a_min.value, slot, 0, False)
                omax = jax.lax.dynamic_index_in_dim(a_max.value, slot, 0, False)
                inited = jax.lax.dynamic_index_in_dim(a_init.value, slot, 0, False)
                m = aspec.momentum if aspec.running_stat else 0.0
                nmin = jnp.where(inited, omin * m + cmin * (1 - m), cmin)
                nmax = jnp.where(inited, omax * m + cmax * (1 - m), cmax)
                a_min.value = jax.lax.dynamic_update_index_in_dim(
                    a_min.value, nmin[None], slot, 0)
                a_max.value = jax.lax.dynamic_update_index_in_dim(
                    a_max.value, nmax[None], slot, 0)
                a_init.value = jax.lax.dynamic_update_index_in_dim(
                    a_init.value, jnp.ones((1,), jnp.bool_), slot, 0)
                d, z = core.qparams_minmax(nmin[None], nmax[None], aspec)
                xv = core.fake_quant(xv, d, z, aspec)
            else:
                d = jax.lax.dynamic_index_in_dim(
                    a_delta.value[aspec.bit_idx], qctx.act_slot, 0, False)
                z = jax.lax.dynamic_index_in_dim(
                    a_zp.value[aspec.bit_idx], qctx.act_slot, 0, False)
                xv = core.fake_quant(xv, d, z, aspec, rng=qctx.rng)
            x = self._from_token_view(xv, orig_shape)

        # ---- weight quantization ----
        w_eff = kernel.astype(jnp.float32)
        if cs is not None:
            w_eff = w_eff * cs[:, None]  # scale input channels (quant_layer.py:183)
        if wspec is not None and lspec.weight_quant:
            if smooth.enable and smooth.channel_wise_scale_type == "dynamic":
                # dynamic CB: the balanced weight depends on the live acts, so
                # qparams are computed on the fly (matches the reference's
                # per-forward lazy weight init under dynamic CB).
                d, z = core.compute_qparams(w_eff, wspec)
            elif smooth.enable and smooth.frozen_tr0_weights:
                # reference runtime semantics: w*cs(tr) is quantized with
                # TIMERANGE-0's tables at every timerange (the per-tr tables
                # are saved but never re-read — base_quantizer.py:126-134;
                # SmoothQuantSpec.frozen_tr0_weights)
                d = w_q[0].value[wspec.bit_idx, 0]
                z = w_q[1].value[wspec.bit_idx, 0]
            else:
                d = jax.lax.dynamic_index_in_dim(
                    w_q[0].value[wspec.bit_idx], tr_id, 0, False)
                z = jax.lax.dynamic_index_in_dim(
                    w_q[1].value[wspec.bit_idx], tr_id, 0, False)
            alpha_v = (w_alpha.value
                       if wspec.round_mode == "learned_hard_sigmoid" else None)
            w_eff = core.fake_quant(w_eff, d, z, wspec, rng=qctx.rng,
                                    alpha=alpha_v,
                                    soft_targets=qctx.soft_targets)
        # (else: smooth-on + weight-fp keeps the scaled weight, matching the
        #  reference fp branch, quant_layer.py:188-189)

        return self._dense(x, w_eff.astype(self.param_dtype), bias)

    def _dense(self, x, kernel, bias):
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class QuantConv(QuantLinear):
    """Quantization-aware channels-last convolution with FULL QuantLinear
    parity (calibrated w/a tables, smooth-quant, timestep slots, AdaRound,
    native int8/weight-only backends, capture) — the reference wraps ConvNd
    with the same QuantLayer machinery it uses for Linear
    (quant_layer.py:34-45).

    TPU-first design: the conv is lowered to im2col patches + the shared
    `_quant_forward` dense pipeline, so every quant feature applies without
    a second implementation. The kernel param keeps the flax conv layout
    [*k, C_in, F] (checkpoint-compatible with nn.Conv / the torch
    converters); it is viewed as a 2D [prod(k)*C_in, F] matrix internally.
    Non-overlapping patchify convs (stride == kernel, the model zoo's only
    convs: patch embedders, Σ sr conv) lower to a pure reshape — zero
    overhead on the MXU path. Note: act-quant token/channel groups apply to
    the im2col'd patch channels (prod(k)*C_in), not raw C_in — identical
    values, regrouped; per-tensor quant is bit-identical to the reference.
    """

    kernel_size: tuple = (3, 3)
    strides: Optional[tuple] = None  # default: kernel_size (patchify)
    padding: Any = "VALID"

    @nn.compact
    def __call__(self, x, qctx: Optional[QuantCtx] = None):
        """x: [B, *spatial, C_in] channels-last ->
        [B, *out_spatial, features]."""
        k = tuple(self.kernel_size)
        strides = tuple(self.strides) if self.strides is not None else k
        kshape = k + (x.shape[-1], self.features)
        kernel = self.param("kernel", self.kernel_init, kshape,
                            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        B, c_in = x.shape[0], x.shape[-1]
        spatial = x.shape[1:-1]
        nd = len(k)
        assert len(spatial) == nd, (x.shape, k)

        if strides == k and self.padding in ("VALID", "SAME") \
                and all(s % p == 0 for s, p in zip(spatial, k)):
            # patchify: pure reshape, patch channels ordered (*k, C_in) —
            # exactly the kernel's flatten order
            grid = tuple(s // p for s, p in zip(spatial, k))
            shape = (B,)
            perm = [0]
            for g, p in zip(grid, k):
                shape += (g, p)
            x = x.reshape(shape + (c_in,))
            perm += [1 + 2 * i for i in range(nd)] \
                + [2 + 2 * i for i in range(nd)] + [1 + 2 * nd]
            patches = x.transpose(perm).reshape(
                B, int(np.prod(grid)), int(np.prod(k)) * c_in)
            kernel2d = kernel.reshape(-1, self.features)
            out_spatial = grid
        else:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kshape,
                ("NHWC", "HWIO", "NHWC") if nd == 2 else
                (("NWC", "WIO", "NWC") if nd == 1 else
                 ("NDHWC", "DHWIO", "NDHWC")))
            patches = jax.lax.conv_general_dilated_patches(
                x, k, strides, self.padding, dimension_numbers=dn)
            out_spatial = patches.shape[1:-1]
            n_out = int(np.prod(out_spatial))
            # conv_general_dilated_patches emits channels ordered
            # (C_in, *k); reorder the PATCHES to the kernel's (*k, C_in)
            # flatten order so one calibration layout serves both paths
            patches = patches.reshape((B, n_out, c_in, int(np.prod(k))))
            patches = patches.transpose(0, 1, 3, 2).reshape(B, n_out, -1)
            kernel2d = kernel.reshape(-1, self.features)

        out = self._quant_forward(patches, kernel2d, bias, qctx)
        return out.reshape((B,) + tuple(out_spatial) + (self.features,))
