"""Pallas TPU kernels: dynamic per-token quantization + int8 matmul with a
fused dequantization epilogue.

This is the real-integer execution path that the reference paper claims but
never released ("algorithm-level quantization simulation",
/root/reference/README.md:15; SURVEY §2.5): ViDiT-Q W8A8 = per-channel
(possibly asymmetric) int8 weights x per-token asymmetric dynamic int8
activations. The matmul runs on the MXU in int8 with int32 accumulation;
all zero-point cross terms are folded into the epilogue:

  x = (x_q - zp_x[m]) * dx[m]          (per token m, shifted-signed int8)
  w = (w_q - zp_w[n]) * dw[n]          (per out-channel n)

  (x @ w)[m,n] = dx[m]*dw[n] * ( acc[m,n]
                                 - zp_x[m] * colsum_w[n]
                                 - zp_w[n] * rowsum_x[m]
                                 + K * zp_x[m] * zp_w[n] )

colsum_w is precomputed at weight-pack time; rowsum_x falls out of the
dynamic-quant pass. Asymmetric codes in [0, 255] are stored shifted by -128
so the MXU sees int8.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# dynamic per-token quantization
# ---------------------------------------------------------------------------

def _dyn_quant_kernel(x_ref, q_ref, scale_ref, zp_ref, rowsum_ref, *,
                      sym: bool):
    x = x_ref[:].astype(jnp.float32)
    if sym:
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax / 127.0, 1e-6)
        q = jnp.clip(jnp.round(x / scale), -128, 127)
        zp = jnp.zeros_like(scale)
    else:
        # reference asymmetric semantics (base_quantizer.py:191-228):
        # min<=0, max>=0, delta=(max-min)/255, zp=round(-min/delta);
        # codes shifted to signed: q = code - 128, zp' = zp - 128.
        x_min = jnp.minimum(jnp.min(x, axis=-1, keepdims=True), 0.0)
        x_max = jnp.maximum(jnp.max(x, axis=-1, keepdims=True), 0.0)
        scale = jnp.maximum((x_max - x_min) / 255.0, 1e-6)
        zp = jnp.round(-x_min / scale) - 128.0
        q = jnp.clip(jnp.round(x / scale) + zp, -128, 127)
    q_ref[:] = q.astype(jnp.int8)
    scale_ref[:] = scale
    zp_ref[:] = zp
    rowsum_ref[:] = jnp.sum(q, axis=-1, keepdims=True)


def dynamic_quant_rows(x: jnp.ndarray, sym: bool = False,
                       block_m: int = 256) -> Tuple[jnp.ndarray, ...]:
    """Quantize [M, K] rows to int8 in one pass.

    Returns (q int8 [M,K], scale f32 [M,1], zp f32 [M,1], rowsum f32 [M,1]).
    """
    M, K = x.shape
    block_m = min(block_m, _round_up(M, 8))
    Mp = _round_up(M, block_m)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    M_out, M = M, Mp
    grid = (_cdiv(M, block_m),)
    kernel = functools.partial(_dyn_quant_kernel, sym=sym)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block_m, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((block_m, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, K), jnp.int8),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
    )(x)
    return tuple(o[:M_out] for o in out)


# ---------------------------------------------------------------------------
# int8 matmul with dequant epilogue
# ---------------------------------------------------------------------------

def _int8_matmul_kernel(x_ref, w_ref, xs_ref, xzp_ref, xrs_ref,
                        ws_ref, wzp_ref, wcs_ref, o_ref, acc_ref, *,
                        k_steps: int, k_size: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(ki == k_steps - 1)
    def _():
        acc = acc_ref[:].astype(jnp.float32)
        xs = xs_ref[:]          # [BM, 1]
        xzp = xzp_ref[:]        # [BM, 1]
        xrs = xrs_ref[:]        # [BM, 1]
        ws = ws_ref[:]          # [1, BN]
        wzp = wzp_ref[:]        # [1, BN]
        wcs = wcs_ref[:]        # [1, BN]
        corrected = (acc - xzp * wcs - wzp * xrs
                     + (float(k_size) * xzp) * wzp)
        o_ref[:] = (corrected * xs * ws).astype(o_ref.dtype)


def int8_matmul(x_q: jnp.ndarray, w_q: jnp.ndarray,
                x_scale: jnp.ndarray, x_zp: jnp.ndarray,
                x_rowsum: jnp.ndarray,
                w_scale: jnp.ndarray, w_zp: jnp.ndarray,
                w_colsum: jnp.ndarray,
                out_dtype=jnp.bfloat16,
                block_m: int = 256, block_n: int = 256,
                block_k: int = 512) -> jnp.ndarray:
    """[M,K] int8 @ [K,N] int8 -> [M,N] out_dtype with fused dequant.

    x_scale/x_zp/x_rowsum: [M,1] f32. w_scale/w_zp/w_colsum: [1,N] f32.
    """
    M, K = x_q.shape
    K2, N = w_q.shape
    assert K == K2
    block_m = min(block_m, _round_up(M, 32))
    block_n = min(block_n, _round_up(N, 128))
    block_k = min(block_k, _round_up(K, 128))
    # Explicitly zero-pad to block multiples: Pallas out-of-bounds block
    # regions are undefined, and zero int8 codes are exactly neutral here
    # (they contribute 0 to acc and are excluded from the K-sized zp
    # correction, so padding K is exact, not approximate).
    Mp, Np, Kp = (_round_up(M, block_m), _round_up(N, block_n),
                  _round_up(K, block_k))
    if (Mp, Kp) != (M, K):
        x_q = jnp.pad(x_q, ((0, Mp - M), (0, Kp - K)))
        x_scale = jnp.pad(x_scale, ((0, Mp - M), (0, 0)))
        x_zp = jnp.pad(x_zp, ((0, Mp - M), (0, 0)))
        x_rowsum = jnp.pad(x_rowsum, ((0, Mp - M), (0, 0)))
    if (Kp, Np) != (K, N):
        w_q = jnp.pad(w_q, ((0, Kp - K), (0, Np - N)))
        w_scale = jnp.pad(w_scale, ((0, 0), (0, Np - N)))
        w_zp = jnp.pad(w_zp, ((0, 0), (0, Np - N)))
        w_colsum = jnp.pad(w_colsum, ((0, 0), (0, Np - N)))
    # NOTE: padded K columns have x_q = w_q = 0 but nonzero zp corrections
    # would double-count them if k_size were Kp; keep k_size = K and the
    # rowsum/colsum from the *padded* arrays (equal to the unpadded sums).
    M_out, N_out, K_true = M, N, K
    M, K, N = Mp, Kp, Np
    k_steps = _cdiv(K, block_k)
    grid = (_cdiv(M, block_m), _cdiv(N, block_n), k_steps)
    kernel = functools.partial(_int8_matmul_kernel, k_steps=k_steps,
                               k_size=K_true)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * np.dtype(out_dtype).itemsize,
            transcendentals=0),
    )(x_q, w_q, x_scale, x_zp, x_rowsum, w_scale, w_zp, w_colsum)[
        :M_out, :N_out]


# ---------------------------------------------------------------------------
# weight packing + the full quantized-linear op
# ---------------------------------------------------------------------------

def pack_weight(kernel: jnp.ndarray, delta: jnp.ndarray, zp: jnp.ndarray,
                n_bits: int = 8, sym: bool = False) -> dict:
    """Quantize a [K, N] kernel offline into the int8 layout.

    delta/zp: broadcastable [1, N] (per-out-channel). Asymmetric codes in
    [0, 2^b - 1] are shifted by -2^(b-1) into signed int8; symmetric codes
    are natively signed in [-2^(b-1), 2^(b-1) - 1] with zero point 0 (pass
    sym=True — the asym path would clip negative codes to 0). For
    n_bits < 8 the codes simply occupy a sub-range (int4 bit-packing is a
    separate memory-side optimization).
    """
    kernel = kernel.astype(jnp.float32)
    delta = delta.reshape(1, -1).astype(jnp.float32)
    zp = zp.reshape(1, -1).astype(jnp.float32)
    if sym:
        half = float(2 ** (n_bits - 1))
        code = jnp.clip(jnp.round(kernel / delta), -half, half - 1)
        w_q = code.astype(jnp.int8)
        w_zp = jnp.zeros_like(delta)
    else:
        shift = float(2 ** (n_bits - 1))
        n_levels = float(2 ** n_bits)
        code = jnp.clip(jnp.round(kernel / delta) + zp, 0, n_levels - 1) - shift
        w_q = code.astype(jnp.int8)
        w_zp = (zp - shift).astype(jnp.float32)
    colsum = jnp.sum(code, axis=0, keepdims=True).astype(jnp.float32)
    return {"w_q": w_q, "w_scale": delta.astype(jnp.float32).reshape(1, -1),
            "w_zp": w_zp, "w_colsum": colsum}


# Default implementation for the native path. Measured on v5e (chained-
# dependency methodology, M=32768 K=N=1152): XLA int8 dot + fused jnp
# dynamic quant reaches ~80 TOPS asym / ~100 TOPS sym vs ~80 TOPS for the
# hand-written Pallas matmul and ~17-19 TFLOPS for the XLA bf16 baseline —
# XLA's int8 MXU lowering + its elementwise fusion already win, so Pallas
# stays as an opt-in ('pallas') for future fusion work.
NATIVE_IMPL = os.environ.get("VIDITQ_NATIVE_IMPL")  # None = auto


def _default_impl() -> str:
    """'xla' (int8 dot_general + fused elementwise) measured best in-model
    on v5e (613ms vs 1085ms full-model fwd for the current Pallas matmul);
    'mixed' = Pallas fused dynamic-quant pass + XLA int8 dot."""
    return NATIVE_IMPL or "xla"


def quantized_linear_native(x: jnp.ndarray, packed: dict,
                            bias: Optional[jnp.ndarray] = None,
                            act_sym: bool = False,
                            w_sym: bool = False,
                            out_dtype=jnp.bfloat16,
                            impl: Optional[str] = None,
                            residual: Optional[jnp.ndarray] = None,
                            gate: Optional[jnp.ndarray] = None,
                            col_scale: Optional[jnp.ndarray] = None
                            ) -> jnp.ndarray:
    """W8A8 linear: dynamic per-token int8 act quant + int8 MXU matmul.

    x: [..., K]; per-token groups are the flattened leading dims (callers
    reshape to the logical token view first, matching the fake-quant path).

    col_scale: optional [K] / [1, K] per-channel multiplier on x (the
    smooth-quant 1/cs rescale) — folded into the fused kernel's in-kernel
    quantize; applied as one f32 pass on the fallback impls.
    """
    impl = impl or _default_impl()
    if impl in ("fused", "pallas", "mixed"):
        from viditq_tpu.kernels.fused_matmul import fused_available
        if not fused_available():
            impl = "xla"  # CPU / non-TPU fallback, same numerics
    assert residual is None or impl == "fused", \
        "residual epilogue only on the fused impl"
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    if impl == "fused":
        from viditq_tpu.kernels.fused_matmul import fused_dynq_int8_matmul
        out = fused_dynq_int8_matmul(x2, packed["w_q"], packed["w_scale"],
                                     packed["w_zp"], packed["w_colsum"],
                                     sym=act_sym, sym_w=w_sym, bias=bias,
                                     out_dtype=out_dtype,
                                     residual=residual, gate=gate,
                                     col_scale=col_scale)
        return out.reshape(*lead, -1)
    if col_scale is not None:
        x2 = x2.astype(jnp.float32) * col_scale.reshape(1, K)
    if impl == "pallas":
        x_q, xs, xzp, xrs = dynamic_quant_rows(x2, sym=act_sym)
        out = int8_matmul(x_q, packed["w_q"], xs, xzp, xrs,
                          packed["w_scale"], packed["w_zp"],
                          packed["w_colsum"], out_dtype=out_dtype)
    elif impl == "mixed":
        x_q, xs, xzp, xrs = dynamic_quant_rows(x2, sym=act_sym)
        out = int8_matmul_ref(x_q, packed["w_q"], xs, xzp, xrs,
                              packed["w_scale"], packed["w_zp"],
                              packed["w_colsum"], out_dtype=out_dtype)
    else:
        x_q, xs, xzp, xrs = dynamic_quant_rows_ref(x2, sym=act_sym)
        out = int8_matmul_ref(x_q, packed["w_q"], xs, xzp, xrs,
                              packed["w_scale"], packed["w_zp"],
                              packed["w_colsum"], out_dtype=out_dtype)
    if bias is not None:
        out = out + bias.astype(out_dtype)
    return out.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# jnp reference implementations (parity targets + CPU fallback)
# ---------------------------------------------------------------------------

def dynamic_quant_rows_ref(x, sym: bool = False):
    x = x.astype(jnp.float32)
    if sym:
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax / 127.0, 1e-6)
        zp = jnp.zeros_like(scale)
        q = jnp.clip(jnp.round(x / scale), -128, 127)
    else:
        x_min = jnp.minimum(jnp.min(x, axis=-1, keepdims=True), 0.0)
        x_max = jnp.maximum(jnp.max(x, axis=-1, keepdims=True), 0.0)
        scale = jnp.maximum((x_max - x_min) / 255.0, 1e-6)
        zp = jnp.round(-x_min / scale) - 128.0
        q = jnp.clip(jnp.round(x / scale) + zp, -128, 127)
    return (q.astype(jnp.int8), scale, zp,
            jnp.sum(q, axis=-1, keepdims=True))


def int8_matmul_ref(x_q, w_q, x_scale, x_zp, x_rowsum, w_scale, w_zp,
                    w_colsum, out_dtype=jnp.float32):
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    K = x_q.shape[1]
    corrected = acc - x_zp * w_colsum - w_zp * x_rowsum + K * x_zp * w_zp
    return (corrected * x_scale * w_scale).astype(out_dtype)
