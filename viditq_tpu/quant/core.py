"""Functional fake-quantization core.

TPU-native, purely functional re-implementation of the ViDiT-Q quantizer
algorithms (reference `qdiff/quantizer/base_quantizer.py`,
`qdiff/quantizer/dynamic_quantizer.py`). Everything here is jittable, takes
a static `QuantSpec` and returns/consumes `QParams` pytrees — no mutable
module state, no data-dependent Python control flow.

Numerics notes (parity with the reference, deviations documented):
  * min/max clamping: x_min <= 0 and x_max >= 0 are enforced
    (base_quantizer.py:191-194).
  * asymmetric: delta = (x_max - x_min) / (2**b - 1),
    zero_point = round(-x_min / delta) (base_quantizer.py:219,228).
  * symmetric: delta = absmax / (2**(b-1) - 1), zero_point = 0; integer code
    clamped to [-2**(b-1), 2**(b-1)-1] (base_quantizer.py:131,137-138,217).
  * eps floor 1e-6 on delta. DEVIATION: the reference fills the *entire*
    delta tensor with eps when its min is below eps (`delta.fill_(eps)`,
    base_quantizer.py:221-222), destroying all other channels' scales; we
    clamp per element instead, which is strictly more accurate.
  * grid_search_lp: 100 range-shrink candidates s in {0.00..0.99}, inner
    quantize with eps=1e-4 guards, L2 loss, argmin
    (base_quantizer.py:230-249).
  * rounding uses round-half-to-even in both torch and jnp.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.struct

from viditq_tpu.quant.spec import QuantSpec

EPS_DELTA = 1e-6      # base_quantizer.py:220
EPS_GRID = 1e-4       # base_quantizer.py:302
EPS_ZP = 1e-5         # base_quantizer.py:232


@flax.struct.dataclass
class QParams:
    """Calibrated quantization parameters for one quantizer.

    `delta`/`zero_point` are tables of shape
    [n_bitwidth, n_timestep, *group_shape] — the reference's
    `delta_list`/`zero_point_list` buffers (base_quantizer.py:286-290) with a
    compact timestep axis. `group_shape` broadcasts against the quantized
    array (e.g. [1, N_token, 1] for per-token, [1, C_out] for per-channel
    JAX-layout weights).
    """

    delta: jnp.ndarray
    zero_point: jnp.ndarray

    def at(self, bit_idx, t_idx=0) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Select one (delta, zero_point) slice; indices may be traced."""
        d = jax.lax.dynamic_index_in_dim(self.delta, bit_idx, 0, keepdims=False)
        z = jax.lax.dynamic_index_in_dim(self.zero_point, bit_idx, 0, keepdims=False)
        d = jax.lax.dynamic_index_in_dim(d, t_idx, 0, keepdims=False)
        z = jax.lax.dynamic_index_in_dim(z, t_idx, 0, keepdims=False)
        return d, z


def _reduce_axes(ndim: int, spec: QuantSpec) -> Tuple[int, ...]:
    if spec.granularity == "tensor":
        return tuple(range(ndim))
    if spec.granularity == "channel":
        keep = spec.channel_axis % ndim
        return tuple(a for a in range(ndim) if a != keep)
    if spec.granularity == "token":
        if ndim < 2:
            raise ValueError("token granularity needs >=2 dims")
        keep = ndim - 2
        return tuple(a for a in range(ndim) if a != keep)
    raise ValueError(spec.granularity)


def minmax(x: jnp.ndarray, spec: QuantSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Group-wise (min, max) with the reference's sign clamps.

    Returns arrays broadcastable against `x` (keepdims=True).
    Reference: base_quantizer.py:168-194.
    """
    axes = _reduce_axes(x.ndim, spec)
    x = x.astype(jnp.float32)
    x_min = jnp.minimum(jnp.min(x, axis=axes, keepdims=True), 0.0)
    x_max = jnp.maximum(jnp.max(x, axis=axes, keepdims=True), 0.0)
    return x_min, x_max


def update_running_minmax(state: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
                          x_min: jnp.ndarray, x_max: jnp.ndarray,
                          momentum: float,
                          initialized) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Momentum accumulation of activation ranges (base_quantizer.py:196-207).

    `initialized` may be a traced bool scalar; the first observation is stored
    verbatim, later ones are blended with `momentum`.
    """
    if state is None:
        return x_min, x_max
    old_min, old_max = state
    blended_min = old_min * momentum + x_min * (1.0 - momentum)
    blended_max = old_max * momentum + x_max * (1.0 - momentum)
    new_min = jnp.where(initialized, blended_min, x_min)
    new_max = jnp.where(initialized, blended_max, x_max)
    return new_min, new_max


def qparams_minmax(x_min: jnp.ndarray, x_max: jnp.ndarray, spec: QuantSpec,
                   n_bits: Optional[int] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """'min_max' scale init (base_quantizer.py:213-228)."""
    n_levels = spec.n_levels(n_bits)
    if spec.sym:
        absmax = jnp.maximum(jnp.abs(x_min), jnp.abs(x_max))
        delta = absmax / n_levels
    else:
        delta = (x_max - x_min) / (n_levels - 1)
    delta = jnp.maximum(delta, EPS_DELTA)
    if spec.always_zero or spec.sym:
        zero_point = jnp.zeros_like(delta)
    else:
        zero_point = jnp.round(-x_min / delta)
    return delta, zero_point


def _quantize_with_range(x, x_max, x_min, n_bits: int, n_levels: int,
                         always_zero: bool):
    """Inner quantize used by the grid search (base_quantizer.py:292-316).

    x: [n_cand, *shape]; x_max/x_min: [n_cand, *group_shape(keepdims)].
    """
    if always_zero:
        delta = x_max / (2 ** n_bits - 1)
        zero_point = jnp.zeros_like(delta)
    else:
        delta = (x_max - x_min) / (2 ** n_bits - 1)
        zero_point = jnp.round(-x_min / (delta + EPS_ZP))
    x_int = jnp.round(x / (delta + EPS_GRID))
    x_quant = jnp.clip(x_int + zero_point, 0, n_levels - 1)
    return (x_quant - zero_point) * delta


def qparams_grid_search(x: jnp.ndarray, x_min: jnp.ndarray, x_max: jnp.ndarray,
                        spec: QuantSpec, n_bits: Optional[int] = None,
                        n_steps: int = 100
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """'grid_search_lp' scale init (base_quantizer.py:230-249).

    Vectorized over the candidate axis: scales (x_min, x_max) by
    s in {0, 1/n, ..., (n-1)/n}, fake-quantizes, takes the L2-argmin per
    group. The reference takes a single global argmin across candidates
    (flattened over groups via its modified `lp_loss`); we keep that
    semantics: one winning candidate index for the whole tensor.
    """
    b = spec.n_bits if n_bits is None else n_bits
    n_levels = spec.n_levels(n_bits)
    x = x.astype(jnp.float32)
    scalings = (jnp.arange(n_steps, dtype=jnp.float32) / n_steps)

    # Sequential over candidates (lax.map): the broadcast form materialized
    # [n_steps, *x.shape] — 2.1GB for one XL fc2 kernel and 59GB under the
    # scanned-stack vmap (round-4 on-chip OOM). One candidate in flight
    # keeps the working set at |x|.
    def loss_of(s):
        x_q = _quantize_with_range(x, x_max * s, x_min * s, b, n_levels,
                                   spec.always_zero)
        # L2 loss per candidate (reference lp_loss reduction='none'
        # semantics: sum of squared error, base_quantizer.py:367-399).
        return jnp.sum((x - x_q) ** 2)

    losses = jax.lax.map(loss_of, scalings)
    idx = jnp.argmin(losses)
    s_best = jnp.take(scalings, idx)
    best_max = x_max * s_best
    best_min = x_min * s_best
    if spec.always_zero:
        delta = best_max / (2 ** b - 1)
        zero_point = jnp.zeros_like(delta)
    else:
        delta = (best_max - best_min) / (2 ** b - 1)
        zero_point = jnp.round(-best_min / (delta + EPS_ZP))
    return delta, zero_point


def compute_qparams(x: jnp.ndarray, spec: QuantSpec,
                    n_bits: Optional[int] = None,
                    running_state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Calibrate one (delta, zero_point) slice from live data.

    The union of the reference's `init_quant_params` paths
    (base_quantizer.py:146-290) for a single bitwidth.
    """
    x_min, x_max = minmax(x, spec)
    if running_state is not None:
        x_min, x_max = running_state
    if spec.scale_method == "min_max":
        return qparams_minmax(x_min, x_max, spec, n_bits)
    if spec.scale_method == "grid_search_lp":
        return qparams_grid_search(x, x_min, x_max, spec, n_bits)
    raise NotImplementedError(spec.scale_method)


def round_ste(x: jnp.ndarray) -> jnp.ndarray:
    """Straight-through rounding (base_quantizer.py:361-365)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def _int_code(x, delta, spec: QuantSpec, *, rng=None, alpha=None,
              soft_targets: bool = True):
    """x / delta with the configured rounding mode → unclamped integer code."""
    scaled = x / delta
    mode = spec.round_mode
    if mode == "nearest":
        return jnp.round(scaled)
    if mode == "nearest_ste":
        return round_ste(scaled)
    if mode == "stochastic":
        if rng is None:
            raise ValueError("stochastic rounding needs an rng key")
        floor = jnp.floor(scaled)
        rest = scaled - floor
        return floor + jax.random.bernoulli(rng, rest).astype(scaled.dtype)
    if mode == "learned_hard_sigmoid":
        # AdaRound (base_quantizer.py:91-101): floor + {soft target | (a>=0)}.
        if alpha is None:
            raise ValueError("learned_hard_sigmoid needs alpha")
        floor = jnp.floor(scaled)
        if soft_targets:
            gamma, zeta = ADAROUND_GAMMA, ADAROUND_ZETA
            soft = jnp.clip(jax.nn.sigmoid(alpha) * (zeta - gamma) + gamma, 0, 1)
            return floor + soft
        return floor + (alpha >= 0).astype(scaled.dtype)
    raise ValueError(f"Wrong rounding mode {mode}")


ADAROUND_GAMMA = -0.1
ADAROUND_ZETA = 1.1
ADAROUND_BETA = 2.0 / 3.0


def adaround_init_alpha(x: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Init AdaRound alpha so sigmoid(alpha) == rounding rest
    (base_quantizer.py:255-264)."""
    rest = x / delta - jnp.floor(x / delta)
    rest = jnp.clip(rest, 1e-4, 1 - 1e-4)
    return -jnp.log((ADAROUND_ZETA - ADAROUND_GAMMA) / (rest - ADAROUND_GAMMA) - 1.0)


def adaround_soft_targets(alpha: jnp.ndarray) -> jnp.ndarray:
    """base_quantizer.py:108-110."""
    return jnp.clip(
        jax.nn.sigmoid(alpha) * (ADAROUND_ZETA - ADAROUND_GAMMA) + ADAROUND_GAMMA,
        0, 1)


def fake_quant(x: jnp.ndarray, delta: jnp.ndarray, zero_point: jnp.ndarray,
               spec: QuantSpec, n_bits: Optional[int] = None, *,
               rng=None, alpha=None, soft_targets: bool = True) -> jnp.ndarray:
    """Quantize-dequantize with given parameters (base_quantizer.py:112-144).

    Output dtype matches the input; internal math runs in fp32 — the
    reference runs in the model dtype (fp16/fp32); fp32 here is within the
    fake-quant tolerance and avoids bf16 rounding on TPU.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    zero_point = zero_point.astype(jnp.float32)
    n_levels = spec.n_levels(n_bits)
    x_int = _int_code(xf, delta, spec, rng=rng, alpha=alpha,
                      soft_targets=soft_targets) + zero_point
    if spec.sym:
        x_quant = jnp.clip(x_int, -n_levels - 1, n_levels)
    else:
        x_quant = jnp.clip(x_int, 0, n_levels - 1)
    x_dequant = (x_quant - zero_point) * delta
    return x_dequant.astype(orig_dtype)


def fake_quant_dynamic(x: jnp.ndarray, spec: QuantSpec) -> jnp.ndarray:
    """Dynamic quantization: calibrate from the live tensor, then fake-quant.

    Reference `DynamicActQuantizer.forward` (dynamic_quantizer.py:16-45) minus
    its dead duplicate `rounding` call (SURVEY §5 landmine (e)).
    """
    delta, zero_point = compute_qparams(x, spec)
    return fake_quant(x, delta, zero_point, spec)


def fake_quant_indexed(x: jnp.ndarray, qparams: QParams, spec: QuantSpec,
                       bit_idx, t_idx=0, *, n_bits_arr=None,
                       alpha=None, soft_targets: bool = True) -> jnp.ndarray:
    """Fake-quant selecting (bitwidth, timestep) slices from tables.

    When `bit_idx` is a traced value the clamp bound must be dynamic too:
    pass `n_bits_arr` (int32 [n_bitwidth], == spec.bits_tuple) and the level
    count is gathered. Replaces the reference's mutable
    `delta = delta_list[bit_idx, t]` (base_quantizer.py:126-127).
    """
    delta, zero_point = qparams.at(bit_idx, t_idx)
    if n_bits_arr is None:
        return fake_quant(x, delta, zero_point, spec, alpha=alpha,
                          soft_targets=soft_targets)
    bits = jax.lax.dynamic_index_in_dim(jnp.asarray(n_bits_arr), bit_idx, 0,
                                        keepdims=False)
    n_levels = jnp.where(spec.sym, 2 ** (bits - 1) - 1, 2 ** bits)
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_int = _int_code(xf, delta.astype(jnp.float32), spec, alpha=alpha,
                      soft_targets=soft_targets) + zero_point
    if spec.sym:
        x_quant = jnp.clip(x_int, -n_levels - 1, n_levels)
    else:
        x_quant = jnp.clip(x_int, 0, n_levels - 1)
    return ((x_quant - zero_point) * delta).astype(orig_dtype)


def init_qparams_table(spec: QuantSpec, group_shape: Tuple[int, ...]
                       ) -> QParams:
    """Allocate an uncalibrated table filled with the reference's -1 sentinel
    (base_quantizer.py:287-288)."""
    shape = (spec.n_bitwidth, spec.n_timestep) + tuple(group_shape)
    return QParams(delta=jnp.full(shape, -1.0, jnp.float32),
                   zero_point=jnp.full(shape, -1.0, jnp.float32))


def calibrate_into_table(table: QParams, x: jnp.ndarray, spec: QuantSpec,
                         t_idx: int = 0,
                         running_state=None) -> QParams:
    """Calibrate all configured bitwidths from `x` into table slot `t_idx`.

    Reference: the mixed-precision init loop (base_quantizer.py:115-119) plus
    the `delta_list[i_bitwidth, cur_timestep_id] = delta` store (:289-290).
    """
    deltas, zps = [], []
    for b in spec.bits_tuple:
        d, z = compute_qparams(x, spec, n_bits=b, running_state=running_state)
        deltas.append(d)
        zps.append(z)
    delta_b = jnp.stack(deltas)   # [n_bitwidth, *group_shape]
    zp_b = jnp.stack(zps)
    new_delta = jax.lax.dynamic_update_index_in_dim(
        table.delta, delta_b[:, None], t_idx, 1)
    new_zp = jax.lax.dynamic_update_index_in_dim(
        table.zero_point, zp_b[:, None], t_idx, 1)
    return QParams(delta=new_delta, zero_point=new_zp)


def group_shape_of(x_shape: Tuple[int, ...], spec: QuantSpec) -> Tuple[int, ...]:
    """Broadcastable shape of one (delta, zero_point) group slice."""
    if spec.granularity == "tensor":
        return (1,) * len(x_shape)
    if spec.granularity == "channel":
        keep = spec.channel_axis % len(x_shape)
        return tuple(n if a == keep else 1 for a, n in enumerate(x_shape))
    if spec.granularity == "token":
        keep = len(x_shape) - 2
        return tuple(n if a == keep else 1 for a, n in enumerate(x_shape))
    raise ValueError(spec.granularity)


def smooth_quant_scale(a_absmax: jnp.ndarray, w_absmax: jnp.ndarray,
                       alpha) -> jnp.ndarray:
    """Per-channel smooth-quant balancing scale
    cs = a_max^alpha / w_max^(1-alpha) (quant_layer.py:108-140), with the
    reference's clamps (act 1e-5, quant_layer.py:130-134; weight 1e-12)
    applied uniformly. The SINGLE definition used by the runtime layer,
    offline calibration, native packing and the alpha sweep — keep them
    from diverging (a past divergence: the runtime's dynamic branch
    skipped the act clamp, so a dead input channel gave cs=0 -> x/cs=inf).
    """
    a = jnp.maximum(a_absmax, 1e-5)
    w = jnp.maximum(w_absmax, 1e-12)
    return (a ** alpha) / (w ** (1 - alpha))
