"""Fused dynamic-quant int8 matmul: ONE Pallas kernel for the whole W8A8
linear.

The measured breakdown on v5e (tests via chained 20-layer microbench,
M=32768 K=N=1152): bf16 dot 0.517ms; XLA int8 path 0.537ms — the int8 MXU
win (~2x) is fully consumed by the separate dynamic-quant pass and the
int32->f32 epilogue materialization. This kernel removes both: per M-block
the bf16 activations are read once, quantized to int8 in VMEM (on the j==0
grid step, cached in scratch for all N-blocks), multiplied on the MXU in
int8, and dequantized in registers before a single bf16 store.

  x = (x_q - zp_x[m]) * dx[m]   (per-row asym, codes shifted to signed)
  w = (w_q - zp_w[n]) * dw[n]   (per-out-channel asym, packed offline)

  out[m,n] = dx[m]*dw[n] * ( x_q@w_q - zp_x[m]*colsum_w[n]
                             - zp_w[n]*rowsum_x[m] + K*zp_x[m]*zp_w[n] )
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _kernel(x_ref, w_ref, ws_ref, wzp_ref, wcs_ref, o_ref,
            xq_ref, xs_ref, xzp_ref, xrs_ref, *,
            k_size: int, sym: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        # quantize this M-block once; reuse across every N-block
        x = x_ref[:].astype(jnp.float32)
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
        xq_ref[:] = q.astype(jnp.int8)
        xs_ref[:] = scale
        xzp_ref[:] = zp
        xrs_ref[:] = jnp.sum(q, axis=-1, keepdims=True)

    acc = jax.lax.dot_general(
        xq_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    corrected = (acc - xzp_ref[:] * wcs_ref[:] - wzp_ref[:] * xrs_ref[:]
                 + (float(k_size) * xzp_ref[:]) * wzp_ref[:])
    o_ref[:] = (corrected * xs_ref[:] * ws_ref[:]).astype(o_ref.dtype)


def fused_dynq_int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray,
                           w_scale: jnp.ndarray, w_zp: jnp.ndarray,
                           w_colsum: jnp.ndarray, sym: bool = False,
                           out_dtype=jnp.bfloat16,
                           block_m: Optional[int] = None,
                           block_n: Optional[int] = None) -> jnp.ndarray:
    """x: [M, K] bf16/f32; w_q: [K, N] int8 (full-K blocks — K must fit
    VMEM; true for every DiT linear, K <= 4608). Returns [M, N].

    Default blocks from v5e tuning: full-N when it fits (one quantize per
    M-block, no scratch revisits; bm1024/bn-full measured 102 TOPS vs 85
    for 512x512)."""
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2
    if block_n is None:
        block_n = _round_up(N, 128) if N <= 2048 else 512
    if block_m is None:
        # VMEM budget: x bf16 (pipelined x2) + int8/scales scratch + w int8
        # (x2) + out f32 acc; keep under ~12MB of the 16MB VMEM
        def vmem(bm):
            return (bm * K * 2 * 2 + bm * K + 2 * K * block_n
                    + 2 * bm * block_n * 4 + 4 * bm * 4)
        block_m = 1024
        # Mosaic stacks more buffering than the naive estimate (observed
        # ~1.8x); budget conservatively
        while block_m > 128 and vmem(block_m) > 8 * 1024 * 1024:
            block_m //= 2
    block_m = min(block_m, _round_up(M, 8))
    block_n = min(block_n, _round_up(N, 128))
    Mp, Np = _round_up(M, block_m), _round_up(N, block_n)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    if Np != N:
        w_q = jnp.pad(w_q, ((0, 0), (0, Np - N)))
        w_scale = jnp.pad(w_scale, ((0, 0), (0, Np - N)))
        w_zp = jnp.pad(w_zp, ((0, 0), (0, Np - N)))
        w_colsum = jnp.pad(w_colsum, ((0, 0), (0, Np - N)))
    grid = (Mp // block_m, Np // block_n)
    kernel = functools.partial(_kernel, k_size=K, sym=sym)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, K), jnp.int8),
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, 1), jnp.float32),
        ],
        # both 'arbitrary': the j==0 scratch-quantize step requires strict
        # lexicographic (i-major) execution order
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,
            bytes_accessed=(Mp * K * 2 + K * Np
                            + Mp * Np * np.dtype(out_dtype).itemsize),
            transcendentals=0),
    )(x, w_q, w_scale, w_zp, w_colsum)
    return out[:M, :N]
