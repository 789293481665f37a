"""Quantization specifications (static config objects).

TPU-native redesign of the reference quantizer configuration surface
(ViDiT-Q `qdiff/quantizer/base_quantizer.py:25-77`): instead of mutable
`nn.Module` state, a frozen dataclass describes *what* to quantize and a
separate pytree (`viditq_tpu.quant.core.QParams`) carries the calibrated
parameters. Everything here is hashable so it can be closed over by `jax.jit`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Granularity of the quantization groups.
#   "tensor"  - one (delta, zero_point) for the whole array
#   "channel" - one per output channel (reduce over every axis except
#               `channel_axis`; reference `per_group='channel'` with
#               channel_dim=0 on a [C_out, C_in] torch weight == axis=-1 on a
#               JAX [C_in, C_out] kernel)
#   "token"   - one per token row (reduce over every axis except -2; the
#               reference reshapes activations to [B, N_token, C] first,
#               `base_quantizer.py:177-185`)
GRANULARITIES = ("tensor", "channel", "token")

SCALE_METHODS = ("min_max", "grid_search_lp")

ROUND_MODES = ("nearest", "nearest_ste", "stochastic", "learned_hard_sigmoid")


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static description of a single quantizer.

    Mirrors the reference config keys (`base_quantizer.py:29-59`) but is a
    frozen, hashable value usable as a static jit argument.
    """

    n_bits: int = 8
    granularity: str = "tensor"          # reference `per_group` (False/'channel'/'token')
    channel_axis: int = -1               # reference `channel_dim` (on JAX layout)
    scale_method: str = "min_max"
    round_mode: str = "nearest_ste"
    sym: bool = False
    always_zero: bool = False            # x_min pinned at 0 (softmax quant)
    dynamic: bool = False                # recompute qparams online per call
    running_stat: bool = False           # momentum-accumulate min/max during calib
    momentum: float = 0.95               # reference hardcodes 0.95 (base_quantizer.py:47)
    # Mixed precision: tuple of candidate bitwidths. When set, calibrated
    # tables carry a leading [n_bitwidth] axis and `bit_idx` selects at run
    # time (reference `mixed_precision` + `bit_idx`, base_quantizer.py:32-36).
    mixed_precision: Optional[Tuple[int, ...]] = None
    # Timestep-wise tables: number of calibrated timestep slots. The reference
    # materializes 1000 slots and repeat_interleaves calib steps into them
    # (`quant_model.py:184-197`); we keep `n_timestep` compact (== number of
    # calib steps or smooth-quant timeranges) and map sampler timesteps to
    # slots with an index array instead.
    timestep_wise: bool = False
    n_timestep: int = 1
    # Timerange-gathered mixed precision (weights, native backend): bits per
    # smooth-quant timerange. When set, the native slabs are packed at
    # mp_bits[tr] per timerange and the runtime GATHERS per-range effective
    # scale/zp tables (w_mp_scale/w_mp_zp) by tr_id — one compiled scan for
    # the whole timestep-MP sampler instead of one program per range
    # (reference flips bitwidths mutably per step,
    # t2v/opensora/schedulers/iddpm/gaussian_diffusion.py:740-767).
    mp_bits: Optional[Tuple[int, ...]] = None

    def __post_init__(self):
        if self.granularity not in GRANULARITIES:
            raise ValueError(f"granularity must be one of {GRANULARITIES}")
        if self.scale_method not in SCALE_METHODS:
            raise ValueError(f"scale_method must be one of {SCALE_METHODS}")
        if self.round_mode not in ROUND_MODES:
            raise ValueError(f"round_mode must be one of {ROUND_MODES}")
        if not (2 <= self.n_bits <= 16):
            raise ValueError("bitwidth not supported")
        if self.mixed_precision is not None and self.n_bits not in self.mixed_precision:
            raise ValueError("n_bits must be a member of mixed_precision")
        if self.mp_bits is not None:
            bad = [b for b in self.mp_bits if b not in self.bits_tuple]
            if bad:
                raise ValueError(
                    f"mp_bits {self.mp_bits}: bits {bad} not among the "
                    f"calibrated bitwidths {self.bits_tuple}")

    @property
    def n_bitwidth(self) -> int:
        return len(self.mixed_precision) if self.mixed_precision else 1

    @property
    def bit_idx(self) -> int:
        """Index of the active bitwidth in the table (base_quantizer.py:34)."""
        if self.mixed_precision is None:
            return 0
        return self.mixed_precision.index(self.n_bits)

    @property
    def bits_tuple(self) -> Tuple[int, ...]:
        return tuple(self.mixed_precision) if self.mixed_precision else (self.n_bits,)

    def n_levels(self, n_bits: Optional[int] = None) -> int:
        """Quantization level count, reference semantics (base_quantizer.py:131).

        Asymmetric: 2**b levels in [0, 2**b - 1].
        Symmetric: the reference sets n_levels = 2**(b-1) - 1 and clamps the
        integer code to [-n_levels - 1, n_levels], i.e. [-2**(b-1), 2**(b-1)-1].
        """
        b = self.n_bits if n_bits is None else n_bits
        return 2 ** b if not self.sym else 2 ** (b - 1) - 1

    def with_bits(self, n_bits: int) -> "QuantSpec":
        """Reference `bitwidth_refactor` (base_quantizer.py:319-325).

        For non-dynamic quantizers the calibrated tables only carry entries
        for `bits_tuple`; switching to an uncalibrated bitwidth would
        silently index the wrong table (bit_idx 0), so it is rejected.
        Dynamic quantizers compute qparams online and may switch freely.
        """
        if not self.dynamic and n_bits not in self.bits_tuple:
            raise ValueError(
                f"with_bits({n_bits}): not among calibrated bitwidths "
                f"{self.bits_tuple}; set mixed_precision to calibrate "
                f"multi-bit tables first")
        return dataclasses.replace(self, n_bits=n_bits)


@dataclasses.dataclass(frozen=True)
class SmoothQuantSpec:
    """Channel-balancing ("smooth quant") config.

    Reference: `qdiff/models/quant_layer.py:79-97` — scale =
    act_max**alpha / weight_absmax**(1-alpha), optionally momentum-accumulated
    act stats, with per-timerange alpha.
    """

    enable: bool = False
    # "dynamic": recompute act scale from the live batch each call.
    # "momentum_act_max": use calibrated running act_max stats.
    channel_wise_scale_type: str = "momentum_act_max"
    momentum: float = 0.95
    # One alpha per timerange (scalar broadcast if a single value given).
    alpha: Tuple[float, ...] = (0.5,)
    # Inclusive [start, end] diffusion-timestep ranges that must tile [0,1000]
    # (reference asserts contiguity, quant_layer.py:85-89).
    timerange: Tuple[Tuple[int, int], ...] = ((0, 1000,),)
    # Reference-faithful runtime weight-table selection. The reference
    # computes and SAVES per-timerange weight qparams (delta_list[bit, tr]),
    # but its runtime forward never re-indexes them: `self.delta` is
    # assigned `delta_list[bit_idx, 0]` during the init forwards
    # (base_quantizer.py:126-127) and BaseQuantizer.forward (:134) uses that
    # frozen buffer ever after — so at inference the weight w*cs(tr) is
    # quantized with TIMERANGE-0's qparams for every timerange (verified
    # bit-exact against the reference driver in
    # tests/test_ptq_driver_parity.py). True mirrors that; False uses the
    # per-timerange tables the reference saves but never reads (the
    # self-consistent "corrected" semantics).
    frozen_tr0_weights: bool = True
    # TPU-native perf knob: pool the CB balancing scale across sibling
    # q/k/v projections (one cs for the three, computed with the MAX of
    # their per-channel weight absmaxes). The upstream OpenSora attention
    # is ONE fused qkv linear (blocks.py:143 `nn.Linear(dim, dim*3)`) — a
    # single cs per input channel IS that granularity; the reference quant
    # flow splits qkv (separate_qkv=True, blocks.py:124) and balances each
    # separately. With a shared cs the q/k/v input quantize collapses to
    # ONE pass (shared_prequant / the block's LN+modulate+quantize
    # producer), removing CB's main runtime cost; quality delta is gated
    # in tests/benchmarks alongside the sym-act deviation.
    qkv_share_cs: bool = False

    def __post_init__(self):
        if not self.enable:
            return
        prev = -1
        for lo, hi in self.timerange:
            if lo != prev + 1:
                raise ValueError("smooth-quant timeranges must be contiguous")
            prev = hi
        if prev != 1000:
            raise ValueError("smooth-quant timeranges must cover [0, 1000]")

    @property
    def n_timerange(self) -> int:
        return len(self.timerange)

    def alpha_for_range(self, idx: int) -> float:
        if len(self.alpha) == 1:
            return self.alpha[0]
        return self.alpha[idx]


@dataclasses.dataclass(frozen=True)
class LayerQuantSpec:
    """Per-layer bundle: weight spec + act spec + smooth quant + flags.

    Replaces the reference's `QuantLayer` wrapper state
    (`qdiff/models/quant_layer.py:22-97`).
    """

    weight: Optional[QuantSpec] = QuantSpec(
        n_bits=8, granularity="channel", round_mode="nearest")
    act: Optional[QuantSpec] = QuantSpec(
        n_bits=8, granularity="token", round_mode="nearest_ste", dynamic=True)
    smooth_quant: SmoothQuantSpec = SmoothQuantSpec()
    weight_quant: bool = True            # reference set_quant_state(weight_quant, ...)
    act_quant: bool = True
    # 'simulate' = fake quant (reference-parity semantics);
    # 'native' = real int8 Pallas kernels (per-row act scales, prepacked
    # weights) — the deploy path the reference paper describes but never
    # released.
    backend: str = "simulate"
    # Native execution implementation: None = auto ('xla'), 'fused' = the
    # single-Pallas-call quantize+matmul+epilogue dataflow (kernels/
    # fused_matmul.py), 'xla'/'pallas'/'mixed' = int_matmul variants.
    impl: Optional[str] = None
    # Optional attention-internal quantizers (reference
    # QuantTransformerBlock act_quantizer_{q,k,v} + softmax quantizer,
    # quant_block.py:181-236): applied to post-projection q/k/v and the
    # softmax output inside SelfAttention when set.
    attn_act: Optional[QuantSpec] = None
    softmax: Optional[QuantSpec] = None
    # Logical token layout this layer's activations should be reshaped to
    # before token-wise quantization; one of None, "spatial", "temporal",
    # "cross_q", "cross_kv" (reference stdit_quant_layer.py).
    token_layout: Optional[str] = None
    # q-diffusion legacy channel split (reference quant_layer.py:72,159-172,
    # 234-237): quantize input channels [:split] and [split:] with separate
    # act/weight quantizer groups. 0 = disabled. Simulate backend only; act
    # qparams are always computed on the fly (dynamic semantics), and the
    # split path is mutually exclusive with smooth-quant (the reference never
    # combines them — its q-diffusion configs have channel_wise_scale off).
    split: int = 0

    def __post_init__(self):
        if self.split > 0 and self.smooth_quant.enable:
            raise ValueError(
                "q-diffusion channel split cannot be combined with "
                "smooth-quant channel balancing: the split branch quantizes "
                "the raw kernel without the balancing rescale")

    def disabled(self) -> "LayerQuantSpec":
        return dataclasses.replace(self, weight_quant=False, act_quant=False)
