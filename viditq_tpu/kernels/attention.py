"""Layout-native attention kernels for DiT-family models.

Why not the stock flash kernel (jax.experimental.pallas.ops.tpu):

1. It consumes [B, H, N, D], so every q/k/v leaves the projection matmul as
   [B*?, N, H, D] and pays an explicit HBM transpose that XLA cannot fuse
   into a Pallas matmul's output (profiled at ~0.4 ms per tensor per block
   at STDiT shapes — ~3.5 ms/block total). These kernels take q/k/v in the
   projection's NATIVE layout [B, N, H, D]; blocks span full (H, D) (the
   Pallas TPU tiling constraint) and the kernel loops over heads in VMEM.
2. STDiT's temporal attention is 16-token sequences; through XLA it
   materializes [B*S, H, T, T] f32 scores whose 16-wide minor dims pad to
   (8, 128) tiles — 8x wasted bandwidth, ~3.2 ms/block profiled. Here short
   segments are packed into one [bq, bq] scores block with a static
   block-diagonal mask — 100% tile utilization for ~bq/seg extra (cheap)
   FLOPs.

At DiT sizes K/V for one batch row fit comfortably in VMEM (N <= ~2048,
H*D <= ~1536), so each grid step computes full softmax blocks in one shot —
no streaming-flash running-max machinery needed. Softmax is f32; matmuls
run on the MXU in bf16.

Reference parity: replaces flash-attn / xformers memory_efficient_attention
(t2v blocks.py:169-187, 300-304) and the fp32-softmax explicit path
(blocks.py:180-187).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(*refs, scale: float, seg_len: int, n_heads: int,
                 head_dim: int, has_mask: bool):
    if has_mask:
        q_ref, k_ref, v_ref, m_ref, o_ref = refs
        kv_bias = jnp.where(m_ref[0] != 0, 0.0, -jnp.inf)  # [1, M] f32
    else:
        q_ref, k_ref, v_ref, o_ref = refs
    d = head_dim
    for h in range(n_heads):
        q = q_ref[0, :, h * d:(h + 1) * d]
        k = k_ref[0, :, h * d:(h + 1) * d]
        v = v_ref[0, :, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            (q.astype(jnp.float32) * scale).astype(jnp.bfloat16),
            k.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_mask:
            s = s + kv_bias
        if seg_len > 0:
            # block-diagonal: row i attends only to its seg_len segment
            ri = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // seg_len
            ci = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) // seg_len
            s = jnp.where(ri == ci, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


def attention_bnhd_xla(q, k, v, scale: float, seg_len: int = 0,
                       kv_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """XLA reference of attention_bnhd (fp32 softmax), used as the
    backward-pass recompute path and as the test oracle."""
    B, N, H, D = q.shape
    if seg_len > 0:
        G = N // seg_len
        qs = q.reshape(B, G, seg_len, H, D)
        ks = k.reshape(B, G, seg_len, H, D)
        vs = v.reshape(B, G, seg_len, H, D)
        attn = jnp.einsum("bgnhd,bgmhd->bghnm", qs * scale, ks,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        out = jnp.einsum("bghnm,bgmhd->bgnhd", attn, vs,
                         preferred_element_type=q.dtype)
        return out.reshape(B, N, H, D)
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                      preferred_element_type=jnp.float32)
    if kv_mask is not None:
        attn = attn + jnp.where(kv_mask[:, None, None, :] != 0,
                                0.0, -jnp.inf)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                      preferred_element_type=q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention_bnhd(q, k, v, kv_mask, scale, seg_len, block_q):
    return _attention_bnhd_impl(q, k, v, kv_mask, scale, seg_len, block_q)


def _attention_bnhd_fwd(q, k, v, kv_mask, scale, seg_len, block_q):
    return (_attention_bnhd_impl(q, k, v, kv_mask, scale, seg_len, block_q),
            (q, k, v, kv_mask))


def _attention_bnhd_bwd(scale, seg_len, block_q, res, g):
    # backward recomputes through the (numerically equivalent) XLA path —
    # keeps the forward on the fast Pallas kernel while making QAT / block
    # reconstruction differentiable through the attention
    q, k, v, kv_mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_bnhd_xla(q_, k_, v_, scale, seg_len,
                                              kv_mask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_attention_bnhd.defvjp(_attention_bnhd_fwd, _attention_bnhd_bwd)


def attention_bnhd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float, seg_len: int = 0,
                   kv_mask: Optional[jnp.ndarray] = None,
                   block_q: Optional[int] = None) -> jnp.ndarray:
    """Softmax attention over [B, N, H, D] inputs -> [B, N, H, D].

    seg_len == 0: full attention per (b, h); k/v may have a different
    (cross-attention) length M — requires M*H*D to fit VMEM.
    seg_len > 0: block-diagonal attention — token i attends to its
    seg_len-sized segment only (STDiT temporal attention with segments
    ordered [(s) t]; also packed equal-length varlen). Requires k/v
    co-indexed with q (same length).
    kv_mask: [B, M] (1 = attend) padding mask for the kv tokens — the
    packed-varlen cross-attention masking (reference BlockDiagonalMask,
    blocks.py:300-304) for fixed-shape 0-padded prompts.

    Differentiable: the forward runs the Pallas kernel; gradients recompute
    through `attention_bnhd_xla` via custom_vjp.
    """
    return _attention_bnhd(q, k, v, kv_mask, scale, seg_len, block_q)


def _attention_bnhd_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         kv_mask: Optional[jnp.ndarray], scale: float,
                         seg_len: int = 0,
                         block_q: Optional[int] = None) -> jnp.ndarray:
    B, N, H, D = q.shape
    M = k.shape[1]
    assert seg_len == 0 or M == N
    C = H * D
    q3 = q.reshape(B, N, C)
    k3 = k.reshape(B, M, C)
    v3 = v.reshape(B, M, C)
    if seg_len > 0:
        if block_q is None:
            # VMEM: 4 distinct [bq, C] bf16 blocks x2 buffers + f32 scores;
            # bq=512 at C=1152 is ~92KB over the 16MB limit
            block_q = min(N, max(seg_len, 256))
        assert block_q % seg_len == 0
    else:
        if block_q is None:
            block_q = min(N, 256)
    assert N % block_q == 0
    grid = (B, N // block_q)
    kernel = functools.partial(_attn_kernel, scale=scale,
                               seg_len=seg_len, n_heads=H, head_dim=D,
                               has_mask=kv_mask is not None)
    # kv block: same rows as q for block-diagonal; full M otherwise
    bkv = block_q if seg_len > 0 else M
    kv_index = ((lambda b, i: (b, i, 0)) if seg_len > 0
                else (lambda b, i: (b, 0, 0)))
    in_specs = [
        pl.BlockSpec((1, block_q, C), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, bkv, C), kv_index),
        pl.BlockSpec((1, bkv, C), kv_index),
    ]
    operands = [q3, k3, v3]
    if kv_mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, M), lambda b, i: (b, 0, 0)))
        operands.append(kv_mask.astype(jnp.int32).reshape(B, 1, M))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * bkv * D,
            bytes_accessed=4 * B * N * H * D * q.dtype.itemsize,
            transcendentals=B * H * N * bkv),
    )(*operands)
    return out.reshape(B, N, H, D)


def attention_ok(n: int, h: int, d: int, seg_len: int = 0,
                 m: Optional[int] = None) -> bool:
    """Whether attention_bnhd handles this shape on the current backend."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        return False
    if h * d * 2 > 4096:  # VMEM budget on the full-(H,D) blocks
        return False
    if seg_len > 0:
        return n % seg_len == 0
    # one-shot per batch row: k/v [M, H, D] must stay VMEM-resident
    m = n if m is None else m
    return n % 128 == 0 and n >= 128 and 8 <= m <= 2048
