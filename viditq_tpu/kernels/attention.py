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
run on the MXU in bf16 (or int8, see below). For longer sequences
(M > ONESHOT_MAX_M: PixArt-Σ 1024's N=4096 self-attention, MMDiT joint
attention) the same API dispatches to a kv-streaming online-softmax kernel
(_attn_stream_kernel) that keeps the layout-native [B, N, C] blocks and
all the int8/emission modes.

Round-3 softmax/VPU optimizations (BENCH_NOTES round-3):
- base-2 softmax: log2(e) folds into the score scale so the VPU runs the
  native exp2 instead of exp's internal ln2-multiply;
- the block-diagonal -inf bias is built ONCE per grid step and added,
  instead of an iota+compare+where per head;
- the PV normalize is deferred: PV contracts the unnormalized e (row-max
  1.0 after the max subtraction) and the [bq, d] output is scaled by 1/r —
  replacing a [bq, bkv] divide per head with a [bq, d] multiply
  (~bkv/d x less VPU divide work);
- the q/k quantizers (int8_qk) execute as ONE external fused
  quantize-dequantize pass per tensor and the QK^T dot stays bf16. This is
  a measured design decision, not a shortcut: at D=72 the contraction pads
  to 128 MXU lanes, and the int8 MXU's 2x rate comes entirely from packing
  two int8 values per lane-cycle of contraction — with the pad, an int8
  QK^T spends the SAME MXU cycles as bf16, so every int8-QK variant
  (in-kernel quantize: +0.4..+4.6 ms/block round 2; pre-quantized int8
  operands + per-(token,head) scale blocks: +16 ms/block round 3) loses
  to bf16-on-dequantized-values, which is also exactly the reference's own
  fake-quant computation model (quant_block.py act_quantizer_{q,k}). The
  PV contraction is bkv >= 256, so int8 PV (int8_pv) keeps its real 2x.

Reference parity: replaces flash-attn / xformers memory_efficient_attention
(t2v blocks.py:169-187, 300-304) and the fp32-softmax explicit path
(blocks.py:180-187).
"""

from __future__ import annotations

import functools
from typing import Optional

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = float(np.log2(np.e))


# bf16 probability-storage bisect arm (benchmarks/run_tpu_pending.sh).
# Read ONCE at import: the flag bakes into compiled kernels, so flipping
# it mid-process would silently serve stale jit cache entries — use a
# fresh process per arm.
_BF16P = os.environ.get("VIDITQ_ATTN_BF16P") == "1"

# one-shot kv VMEM residence bound (rows): beyond this the seg0 path
# switches to the kv-streaming kernel (_attn_stream_kernel)
ONESHOT_MAX_M = 2048


def _attn_kernel(*refs, scale: float, seg_len: int, n_heads: int,
                 head_dim: int, has_mask: bool,
                 int8_pv: bool = False, v_int8_in: bool = False,
                 emit_int8: bool = False, emit_sym: bool = True,
                 need_rowsum: bool = False, out_col_scale: bool = False,
                 block_b: int = 1, diag: str = ""):
    """diag (BENCH-ONLY occupancy decomposition, benchmarks/attn_sched.py):
    '' normal; 'qk_only' emits raw scores (no softmax/PV); 'dots_only'
    runs QK+PV with the softmax replaced by a cast (MXU-only arm). The
    full-vs-dots_only delta is the softmax VPU cost NOT hidden behind the
    MXU dots. block_b: batch rows per grid step (bias/mask built once)."""
    refs = list(refs)
    q_ref = refs.pop(0)
    k_ref = refs.pop(0)
    v_ref = refs.pop(0)
    # v arrives pre-quantized (int8 codes + per-channel scales) from a
    # one-pass producer outside the kernel — halves the v VMEM blocks
    # and removes the per-grid-step requantize
    vs_ref = refs.pop(0) if v_int8_in else None
    m_ref = refs.pop(0) if has_mask else None
    # smooth-quant 1/cs of the consuming proj linear, folded into the
    # emit-path output quantize (keeps the int8-emitting attention
    # available under CB plans)
    ocs_ref = refs.pop(0) if (emit_int8 and out_col_scale) else None
    if emit_int8:
        # int8-emitting output: the proj linear consumes (codes, scales[,
        # zp, rowsum]) directly (int8_consumer_matmul) — the bf16 attention
        # output never round-trips HBM
        oq_ref = refs.pop(0)
        os_ref = refs.pop(0)
        ozp_ref = None if emit_sym else refs.pop(0)
        ors_ref = refs.pop(0) if need_rowsum else None
        oacc_ref = refs.pop(0)                      # f32 scratch [bq, C]
    else:
        o_ref = refs.pop(0)
    # scores run in the log2 domain: exp(x) == exp2(x * log2e) and the VPU's
    # exp2 skips exp's internal ln2 multiply, so log2e folds into `scale`
    scale2 = scale * _LOG2E
    bias = None
    if seg_len > 0:
        # block-diagonal: row i attends only to its seg_len segment.
        # Built ONCE per grid step (f32 [bq, bkv]) and added per head —
        # round 2 ran the iota//seg compare+where once PER HEAD.
        nq = q_ref.shape[1]
        nk = k_ref.shape[1]
        ri = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0) // seg_len
        ci = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1) // seg_len
        bias = jnp.where(ri == ci, 0.0, -jnp.inf)
    seg_bias = bias
    d = head_dim
    pairs = []
    for bb in range(block_b):
        bias = seg_bias
        if has_mask:
            # [1, M] f32 — built once per batch row, added per head
            kv_bias = jnp.where(m_ref[bb] != 0, 0.0, -jnp.inf)
            bias = kv_bias if bias is None else bias + kv_bias
        pairs.extend((bb, h, bias) for h in range(n_heads))
    for bb, h, bias in pairs:
        q = q_ref[bb, :, h * d:(h + 1) * d]
        k = k_ref[bb, :, h * d:(h + 1) * d]
        v = v_ref[bb, :, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            (q.astype(jnp.float32) * scale2).astype(jnp.bfloat16),
            k.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if bias is not None:
            s = s + bias
        if diag == "qk_only":
            o_ref[bb, :, h * d:(h + 1) * d] = (
                s[:, :d].astype(o_ref.dtype))
            continue
        if diag == "dots_only":
            o = jax.lax.dot_general(
                s.astype(v.dtype) if v.dtype != jnp.int8
                else jnp.round(s).astype(jnp.int8),
                v.astype(jnp.bfloat16) if v.dtype == jnp.int8 else v,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[bb, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)
            continue
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m)
        r = jnp.sum(e, axis=-1, keepdims=True)
        if int8_pv:
            # real-exec softmax quantizer (always_zero semantics): after the
            # max subtraction e has row-max 1, so the int8 codes are just
            # round(e*127) — NO [bq, bkv] normalize division at all; the
            # exact 1/(127*rowsum) renormalizer folds into the per-row
            # output dequant. v runs per-channel int8 (scales factor out of
            # the PV contraction; per-token v scales would not).
            pq = jnp.round(e * 127.0).astype(jnp.int8)
            if v_int8_in:
                vq = v
                vs = vs_ref[bb, :, h * d:(h + 1) * d]   # [1, d]
            else:
                vf = v.astype(jnp.float32)
                vs = jnp.maximum(jnp.max(jnp.abs(vf), axis=0, keepdims=True),
                                 1e-6)                  # [1, d]
                vq = jnp.round(vf * (127.0 / vs)).astype(jnp.int8)
            acc = jax.lax.dot_general(
                pq, vq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            o = acc * (1.0 / (127.0 * 127.0) / r) * vs
        else:
            # reciprocal-multiply normalize: one [bq, 1] reciprocal + a
            # broadcast multiply instead of a [bq, bkv] VPU divide.
            # Deferring the normalize past the PV dot (o * 1/r on [bq, d])
            # was re-measured in round 3 with a bf16 e: still +3.5MB Mosaic
            # stack over the 16MB VMEM at the spatial shape, and at
            # block_q=128 (where it compiles) it measured SLOWER than this
            # eager form (14.2 vs 13.3 ms/block sm8 arm) — BENCH_NOTES
            # round-3.
            if _BF16P:
                # bisect arm: cast e to bf16 BEFORE the normalize multiply
                # so the [bq, bkv] VPU mult runs at half bandwidth (row
                # stats m/r stay f32) — round-2 VERDICT #1b second half
                p = (e.astype(jnp.bfloat16)
                     * (1.0 / r).astype(jnp.bfloat16))
            else:
                p = (e * (1.0 / r)).astype(v.dtype)
            o = jax.lax.dot_general(
                p, v.astype(p.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        if emit_int8:
            oacc_ref[:, h * d:(h + 1) * d] = o
        else:
            o_ref[bb, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)
    if emit_int8:
        # row quantize of the assembled output (reference dynamic per-token
        # semantics — same math as fused_matmul._quantize_rows_f32)
        of = oacc_ref[:]
        if out_col_scale:
            # smooth-quant 1/cs of the consuming proj: rescale before the
            # row quantize, exactly as quantize_rows_fused(col_scale=...)
            of = of * ocs_ref[0]
        if emit_sym:
            smax = jnp.maximum(jnp.max(jnp.abs(of), axis=-1, keepdims=True),
                               1e-6)
            oscale = smax / 127.0
            codes = jnp.clip(jnp.round(of * (127.0 / smax)), -128, 127)
        else:
            o_min = jnp.minimum(jnp.min(of, axis=-1, keepdims=True), 0.0)
            o_max = jnp.maximum(jnp.max(of, axis=-1, keepdims=True), 0.0)
            oscale = jnp.maximum((o_max - o_min) / 255.0, 1e-6)
            inv = 1.0 / oscale
            zp = jnp.round(-o_min * inv) - 128.0
            codes = jnp.clip(jnp.round(of * inv) + zp, -128, 127)
            ozp_ref[0] = zp
        oq_ref[0] = codes.astype(jnp.int8)
        os_ref[0] = oscale
        if need_rowsum:
            ors_ref[0] = jnp.sum(codes, axis=-1, keepdims=True)


def _attn_stream_kernel(*refs, scale: float, n_heads: int, head_dim: int,
                        has_mask: bool, int8_pv: bool, v_int8_in: bool,
                        emit_int8: bool, emit_sym: bool, need_rowsum: bool,
                        out_col_scale: bool, n_kv: int):
    """kv-streaming (online-softmax) variant of _attn_kernel for seq
    lengths whose K/V exceed the one-shot VMEM budget (M > 2048: PixArt-Σ
    1024 N=4096, MMDiT joint attention). Grid (B, N/bq, M/bkv) with the kv
    axis innermost+sequential; running (max, sum, acc) live in VMEM scratch
    and the output flushes once per (b, qi) after the last kv step —
    the flash-attention recurrence on the layout-native [B, N, C] blocks."""
    refs = list(refs)
    q_ref = refs.pop(0)
    k_ref = refs.pop(0)
    v_ref = refs.pop(0)
    vs_ref = refs.pop(0) if v_int8_in else None
    m_ref = refs.pop(0) if has_mask else None
    ocs_ref = refs.pop(0) if (emit_int8 and out_col_scale) else None
    if emit_int8:
        oq_ref = refs.pop(0)
        os_ref = refs.pop(0)
        ozp_ref = None if emit_sym else refs.pop(0)
        ors_ref = refs.pop(0) if need_rowsum else None
    else:
        o_ref = refs.pop(0)
    acc_ref = refs.pop(0)    # f32 [bq, C] unnormalized PV accumulator
    mstat_ref = refs.pop(0)  # f32 [bq, 128] running max, col h = head h
    rstat_ref = refs.pop(0)  # f32 [bq, 128] running sum
    kj = pl.program_id(2)
    scale2 = scale * _LOG2E
    d = head_dim

    @pl.when(kj == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        mstat_ref[...] = jnp.full_like(mstat_ref, -jnp.inf)
        rstat_ref[...] = jnp.zeros_like(rstat_ref)

    bias = None
    if has_mask:
        bias = jnp.where(m_ref[0] != 0, 0.0, -jnp.inf)  # [1, bkv]
    # stat tiles: ONE [bq, 128] read per grid step, per-head columns
    # sliced in registers, ONE write at the end — instead of 4 single-lane
    # VMEM read-modify-writes per head (the lane-sliced RMWs dominate the
    # VPU cost at H=16; round-4 streaming-attn bisect)
    mst = mstat_ref[...]
    rst = rstat_ref[...]
    new_m, new_r = [], []
    for h in range(n_heads):
        q = q_ref[0, :, h * d:(h + 1) * d]
        k = k_ref[0, :, h * d:(h + 1) * d]
        v = v_ref[0, :, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            (q.astype(jnp.float32) * scale2).astype(jnp.bfloat16),
            k.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if bias is not None:
            s = s + bias
        m_old = mst[:, h:h + 1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        # fully-masked-so-far rows keep m == -inf; exp2(s - 0) with
        # s == -inf still yields 0, so a zero substitute is exact
        m_safe = jnp.where(m_new == -jnp.inf, 0.0, m_new)
        e = jnp.exp2(s - m_safe)
        corr = jnp.exp2(m_old - m_safe)  # -inf - 0 -> 0: zeroes empty acc
        new_r.append(rst[:, h:h + 1] * corr
                     + jnp.sum(e, axis=-1, keepdims=True))
        new_m.append(m_new)
        if int8_pv:
            # always_zero softmax codes, quantized against the RUNNING max
            # (the corr rescale then folds earlier blocks onto the final
            # max). This deviates from the one-shot/oracle semantics —
            # codes there quantize exp(s - GLOBAL max) — by one extra
            # rounding realization; measured effect is quality-neutral
            # (streaming-vs-fp rel err == one-shot-vs-fp int8-PV noise,
            # ~2.9e-2; tests/test_attention_kernel.py streaming test)
            pq = jnp.round(e * 127.0).astype(jnp.int8)
            if v_int8_in:
                vq = v
                vs = vs_ref[0, :, h * d:(h + 1) * d]  # [1, d]
            else:
                vf = v.astype(jnp.float32)
                vs = jnp.maximum(
                    jnp.max(jnp.abs(vf), axis=0, keepdims=True), 1e-6)
                vq = jnp.round(vf * (127.0 / vs)).astype(jnp.int8)
            pv = jax.lax.dot_general(
                pq, vq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            # pq ~= e*127, vq ~= v*127/vs: pv = (pq @ vq) * vs/127^2 ~= e @ v
            # — the accumulator then matches the bf16 branch exactly and
            # the final normalize is shared
            pv = pv * (vs * (1.0 / (127.0 * 127.0)))
        else:
            pv = jax.lax.dot_general(
                e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_ref[:, h * d:(h + 1) * d] = (
            acc_ref[:, h * d:(h + 1) * d] * corr + pv)
    # single [bq, n_heads]-wide stat write (lane-aligned at col 0)
    mstat_ref[:, :n_heads] = jnp.concatenate(new_m, axis=1)
    rstat_ref[:, :n_heads] = jnp.concatenate(new_r, axis=1)

    @pl.when(kj == n_kv - 1)
    def _emit():
        # per-head normalize IN PLACE via column slices (a
        # [bq, C] -> [bq, H, d] reshape doesn't lower on Mosaic at d=72)
        for h in range(n_heads):
            inv = 1.0 / jnp.maximum(rstat_ref[:, h:h + 1], 1e-30)
            acc_ref[:, h * d:(h + 1) * d] = (
                acc_ref[:, h * d:(h + 1) * d] * inv)
        of = acc_ref[:]
        if emit_int8:
            if out_col_scale:
                of = of * ocs_ref[0]
            if emit_sym:
                smax = jnp.maximum(
                    jnp.max(jnp.abs(of), axis=-1, keepdims=True), 1e-6)
                oscale = smax / 127.0
                codes = jnp.clip(jnp.round(of * (127.0 / smax)), -128, 127)
            else:
                o_min = jnp.minimum(jnp.min(of, axis=-1, keepdims=True), 0.0)
                o_max = jnp.maximum(jnp.max(of, axis=-1, keepdims=True), 0.0)
                oscale = jnp.maximum((o_max - o_min) / 255.0, 1e-6)
                inv = 1.0 / oscale
                zp = jnp.round(-o_min * inv) - 128.0
                codes = jnp.clip(jnp.round(of * inv) + zp, -128, 127)
                ozp_ref[0] = zp
            oq_ref[0] = codes.astype(jnp.int8)
            os_ref[0] = oscale
            if need_rowsum:
                ors_ref[0] = jnp.sum(codes, axis=-1, keepdims=True)
        else:
            o_ref[0] = of.astype(o_ref.dtype)


def select_stream_blocks(n: int, m: int, c: int = 1152,
                         v_int8_in: bool = False) -> "tuple[int, int]":
    """(block_q, block_kv) for the kv-streaming kernel: the largest
    power-of-two blocks (<=512 q rows / <=1024 kv rows) dividing the
    actual lengths whose estimated VMEM working set fits the budget —
    sized by the model width c, so wider models (C>=1536) down-select
    smaller blocks instead of failing Mosaic compilation. At C=1152 the
    estimate reproduces the measured (512, 1024) optimum: q 1.2MB +
    k/v 2x2.4MB(x2 buf) + f32 acc 2.4MB + scores 2MB + stat tiles ~15.6MB.
    The kernel never emits int8 from this path — the emission stat tiles
    overflowed Mosaic's scoped stack in ways this block model cannot
    predict (queue-3/4: (512,1024) 532KB over, (512,512) 1.05M over), so
    _attention_bnhd_impl quantizes streaming outputs in a separate
    bandwidth pass instead. VIDITQ_STREAM_BQ / VIDITQ_STREAM_BKV override
    the caps (bench A/B)."""
    cap_q = int(os.environ.get("VIDITQ_STREAM_BQ", "512"))
    cap_kv = int(os.environ.get("VIDITQ_STREAM_BKV", "1024"))
    budget = float(os.environ.get("VIDITQ_STREAM_VMEM", "16e6"))

    def vmem(bq, bkv):
        return (bq * c * 2          # q block, bf16
                + 2 * bkv * c * 2   # k blocks, double-buffered, bf16
                + 2 * bkv * c * (1 if v_int8_in else 2)  # v blocks, x2 buf
                + bq * c * 4        # f32 PV accumulator scratch
                + bq * bkv * 4      # f32 per-head score/e tile (live copy)
                + 2 * bq * 128 * 4)  # running max/sum stat tiles

    for bq in (512, 256, 128):
        if bq > cap_q or n % bq:
            continue
        for bkv in (1024, 512, 256, 128):
            if bkv > cap_kv or m % bkv:
                continue
            if vmem(bq, bkv) <= budget:
                return bq, bkv
    return 0, 0


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


def attention_bnhd_xla_quant(q, k, v, scale: float, seg_len: int = 0,
                             kv_mask: Optional[jnp.ndarray] = None,
                             int8_qk: bool = False,
                             int8_pv: bool = False,
                             v_block: Optional[int] = None) -> jnp.ndarray:
    """XLA oracle of the int8 attention kernel's exact quantization math
    (per-token sym q/k, round(e*127) softmax codes, per-channel v).

    v_block: v-quantization group along the token axis — pass the kernel's
    block_q for seg mode (where v is quantized per q-block in VMEM); seg0
    mode quantizes v per full token axis (the external producer)."""
    def rq(t, axis):
        tf = t.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(tf), axis=axis, keepdims=True), 1e-6)
        return jnp.round(tf * (127.0 / s)) * (s / 127.0)

    B, N, H, D = q.shape
    if int8_qk:
        q = rq(q, -1)
        k = rq(k, -1)
    if not int8_pv:
        return attention_bnhd_xla(q, k, v, scale, seg_len, kv_mask)
    qh = q.transpose(0, 2, 1, 3).astype(jnp.float32)
    kh = k.transpose(0, 2, 1, 3).astype(jnp.float32)
    vh = v.transpose(0, 2, 1, 3).astype(jnp.float32)
    s = jnp.einsum("bhnd,bhmd->bhnm", qh * scale, kh)
    if kv_mask is not None:
        s = s + jnp.where(kv_mask[:, None, None, :] != 0, 0.0, -jnp.inf)
    if seg_len > 0:
        ri = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) // seg_len
        ci = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3) // seg_len
        s = jnp.where(ri == ci, s, -jnp.inf)
    e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    r = jnp.sum(e, axis=-1, keepdims=True)
    pq = jnp.round(e * 127.0)
    # per-channel v quant over v_block-token groups (axis 2 = token axis)
    M = vh.shape[2]
    vb = M if v_block is None else v_block
    vg = vh.reshape(B, H, M // vb, vb, D)
    vqs = jnp.maximum(jnp.max(jnp.abs(vg), axis=3, keepdims=True), 1e-6)
    vq = (jnp.round(vg * (127.0 / vqs)) * (vqs / 127.0)).reshape(vh.shape)
    o = jnp.einsum("bhnm,bhmd->bhnd", pq, vq)
    o = o * (1.0 / 127.0 / r)
    return o.transpose(0, 2, 1, 3).astype(q.dtype)


def _fake_quant_tokens_headwise(t3, B, N, H, D):
    """One fused XLA pass: per-(token, head) symmetric int8
    quantize-dequantize of a [B, N, C] tensor (the reference
    act_quantizer_{q,k} semantics, quant_block.py:181-236). Numerically
    identical to real int8 codes + scale dequant; see the module docstring
    for why the QK^T dot itself stays bf16 at DiT head dims."""
    tf = t3.reshape(B, N, H, D).astype(jnp.float32)
    sc = jnp.maximum(jnp.max(jnp.abs(tf), axis=-1, keepdims=True), 1e-6)
    dq = jnp.round(tf * (127.0 / sc)) * (sc / 127.0)
    return dq.reshape(B, N, H * D).astype(t3.dtype)


def select_block_q(n: int, seg_len: int,
                   block_q: Optional[int] = None,
                   m: Optional[int] = None) -> int:
    """q-block row count for the attention kernel grid (pure function so
    tests can assert the choice against the VMEM budget for the shape zoo
    without a TPU — round-2 VERDICT weak #3).

    seg mode: VMEM holds 4 distinct [bq, C] bf16 blocks x2 buffers + f32
    scores; bq=512 at C=1152 is ~92KB over the 16MB limit, so cap at 256
    rows. The block must pack whole segments AND divide n (seg_len itself
    always works since n % seg_len == 0). Full mode: kv is the whole
    [M, C], so the q block just needs to divide n — and when that kv
    block is TINY (cross-attention, M <= 256), much larger q tiles fit
    the budget and amortize the per-grid-step per-head overhead: the
    round-5 bq sweep measured 1.581 ms vs 1.997 at bq=1024 on the STDiT
    cross site (N=16384, M=128); bq=2048 fails VMEM. Spatial one-shot
    (M >= 1024) keeps 256 (round-3 sweep: 512 exceeds VMEM by 2.44MB
    on-chip, 128 costs +2.3 ms/block)."""
    if seg_len > 0:
        if block_q is None:
            cap = max(seg_len, 256)
            block_q = next(
                k * seg_len
                for k in range(cap // seg_len, 0, -1)
                if n % (k * seg_len) == 0)
        assert block_q % seg_len == 0 and n % block_q == 0, \
            (n, seg_len, block_q)
    elif block_q is None:
        cross_cap = int(os.environ.get("VIDITQ_ATTN_CROSS_BQ", "1024"))
        cap = cross_cap if (m is not None and m <= 256) else 256
        block_q = min(n, cap)
        while block_q > 128 and n % block_q:
            block_q //= 2
        if n % block_q:
            block_q = 128
    assert n % block_q == 0, (n, block_q)
    return block_q


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _attention_bnhd(q, k, v, kv_mask, scale, seg_len, block_q, int8_qk,
                    int8_pv):
    return _attention_bnhd_impl(q, k, v, kv_mask, scale, seg_len, block_q,
                                int8_qk, int8_pv)


def _attention_bnhd_fwd(q, k, v, kv_mask, scale, seg_len, block_q, int8_qk,
                        int8_pv):
    return (_attention_bnhd_impl(q, k, v, kv_mask, scale, seg_len, block_q,
                                 int8_qk, int8_pv),
            (q, k, v, kv_mask))


def _attention_bnhd_bwd(scale, seg_len, block_q, int8_qk, int8_pv, res, g):
    # backward recomputes through the (numerically equivalent) XLA path —
    # keeps the forward on the fast Pallas kernel while making QAT / block
    # reconstruction differentiable through the attention. For the int8
    # modes this is the STE convention: gradients flow through the
    # unquantized attention (round() is piecewise-constant).
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
                   block_q: Optional[int] = None,
                   int8_qk: bool = False,
                   int8_pv: bool = False) -> jnp.ndarray:
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

    int8_qk / int8_pv: execution of the reference's attention-internal
    quantizers (act_quantizer_{q,k} / softmax+v quantizers,
    quant_block.py:181-236). int8_qk applies per-(token, head) symmetric
    int8 quantize-dequantize to q/k in one external fused pass; the QK^T
    dot stays bf16 (at DiT head dims the lane pad makes a real int8 dot
    cost identical MXU cycles — module docstring). int8_pv runs the
    softmax+v quantizers for REAL: round(e*127) int8 softmax codes with
    the exact row-sum renormalizer folded into the output dequant,
    per-channel int8 v, PV on the MXU at the true 2x int8 rate.

    Differentiable: the forward runs the Pallas kernel; gradients recompute
    through `attention_bnhd_xla` via custom_vjp (STE through the int8
    rounding).
    """
    return _attention_bnhd(q, k, v, kv_mask, scale, seg_len, block_q,
                           int8_qk, int8_pv)


def _attention_bnhd_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         kv_mask: Optional[jnp.ndarray], scale: float,
                         seg_len: int = 0,
                         block_q: Optional[int] = None,
                         int8_qk: bool = False,
                         int8_pv: bool = False,
                         emit_int8: bool = False,
                         emit_sym: bool = True,
                         need_rowsum: bool = False,
                         out_col_scale: Optional[jnp.ndarray] = None,
                         block_b: int = 1,
                         diag: str = ""):
    B, N, H, D = q.shape
    assert out_col_scale is None or emit_int8
    assert block_b == 1 or (not emit_int8 and B % block_b == 0), \
        (B, block_b, emit_int8)
    M = k.shape[1]
    assert seg_len == 0 or M == N
    C = H * D
    q3 = q.reshape(B, N, C)
    k3 = k.reshape(B, M, C)
    v3 = v.reshape(B, M, C)
    # q/k quantizers: one external fused quantize-dequantize pass each;
    # the QK^T dot stays bf16 (see module docstring — at D=72 the lane pad
    # makes an int8 dot cost identical MXU cycles, so every real-int8 QK
    # variant measured slower than this)
    if int8_qk:
        q3 = _fake_quant_tokens_headwise(q3, B, N, H, D)
        k3 = _fake_quant_tokens_headwise(k3, B, M, H, D)
    # int8 PV with a reused kv block (seg_len == 0: spatial/cross): quantize
    # v per-(head-)channel ONCE outside the kernel (a single fused XLA pass)
    # instead of per grid step per head in VMEM — and the kernel's v blocks
    # become int8, halving their VMEM footprint. Block-diagonal (seg) mode
    # keeps the in-kernel per-(q-block x channel) quantize: int8 v blocks
    # measured SLOWER there (head slices of int8 VMEM blocks relayout worse
    # than a register quantize — BENCH_NOTES round-2f); the oracle
    # attention_bnhd_xla_quant mirrors this via its v_block parameter.
    v_int8_in = int8_pv and seg_len == 0
    vs3 = None
    if v_int8_in:
        vf = v3.astype(jnp.float32)
        vsc = jnp.maximum(jnp.max(jnp.abs(vf), axis=1, keepdims=True), 1e-6)
        v3 = jnp.round(vf * (127.0 / vsc)).astype(jnp.int8)
        vs3 = vsc  # [B, 1, C]
    if seg_len == 0 and M > ONESHOT_MAX_M:
        # kv-streaming path: K/V too large for one-shot VMEM residence
        # (PixArt-Σ 1024 / MMDiT joint attention) — online-softmax over
        # kv blocks, everything else (layouts, int8 modes, emission)
        # identical to the one-shot kernel
        assert H <= 128, H
        # int8 EMISSION is handled by an external quantize pass here, not
        # the kernel epilogue: the emit variant's extra stat-output tiles
        # overflow Mosaic's 16MB scoped stack at N=M=4096 C=1152 (queue-3:
        # 532KB over at (512,1024); the (512,512) down-select measured
        # WORSE, 1.05M over — Mosaic's scoped accounting does not follow
        # the block model). At streaming sizes the separate pass costs
        # ~2.5 bytes/elem of HBM (~35us at Σ-1024) — noise next to the
        # attention itself, and the kernel keeps the proven bf16 shape.
        stream_emit = emit_int8
        if stream_emit:
            emit_int8 = False
        bq, bkv = select_stream_blocks(N, M, C, v_int8_in=v_int8_in)
        assert bq and bkv, (N, M)
        grid = (B, N // bq, M // bkv)
        kernel = functools.partial(
            _attn_stream_kernel, scale=scale, n_heads=H, head_dim=D,
            has_mask=kv_mask is not None, int8_pv=int8_pv,
            v_int8_in=v_int8_in, emit_int8=False, emit_sym=emit_sym,
            need_rowsum=need_rowsum,
            out_col_scale=(out_col_scale is not None
                           and not stream_emit), n_kv=M // bkv)
        in_specs = [
            pl.BlockSpec((1, bq, C), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bkv, C), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bkv, C), lambda b, i, j: (b, j, 0)),
        ]
        operands = [q3, k3, v3]
        if v_int8_in:
            in_specs.append(pl.BlockSpec((1, 1, C),
                                         lambda b, i, j: (b, 0, 0)))
            operands.append(vs3)
        if kv_mask is not None:
            in_specs.append(pl.BlockSpec((1, 1, bkv),
                                         lambda b, i, j: (b, 0, j)))
            operands.append(kv_mask.astype(jnp.int32).reshape(B, 1, M))
        if out_col_scale is not None and not stream_emit:
            in_specs.append(pl.BlockSpec((1, 1, C),
                                         lambda b, i, j: (0, 0, 0)))
            operands.append(
                out_col_scale.reshape(1, 1, C).astype(jnp.float32))
        cost = pl.CostEstimate(
            flops=4 * B * H * N * M * D,
            bytes_accessed=(2 * B * N * C + 2 * B * M * C * (N // bq))
            * q.dtype.itemsize,
            transcendentals=B * H * N * M)
        params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
        scratch = [pltpu.VMEM((bq, C), jnp.float32),
                   pltpu.VMEM((bq, 128), jnp.float32),
                   pltpu.VMEM((bq, 128), jnp.float32)]
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bq, C), lambda b, i, j: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
            scratch_shapes=scratch,
            compiler_params=params, cost_estimate=cost)(*operands)
        if stream_emit:
            from viditq_tpu.kernels.fused_matmul import quantize_rows_fused
            codes, scales, zp, rowsum = quantize_rows_fused(
                out.reshape(B * N, C), sym=emit_sym,
                need_rowsum=need_rowsum, col_scale=out_col_scale)
            return (codes.reshape(B, N, C),
                    scales.reshape(B, N, 1),
                    None if zp is None else zp.reshape(B, N, 1),
                    None if rowsum is None else rowsum.reshape(B, N, 1))
        return out.reshape(B, N, H, D)
    block_q = select_block_q(N, seg_len, block_q, m=M)
    grid = (B // block_b, N // block_q)
    kernel = functools.partial(_attn_kernel, scale=scale,
                               seg_len=seg_len, n_heads=H, head_dim=D,
                               has_mask=kv_mask is not None,
                               int8_pv=int8_pv,
                               v_int8_in=v_int8_in, emit_int8=emit_int8,
                               emit_sym=emit_sym, need_rowsum=need_rowsum,
                               out_col_scale=out_col_scale is not None,
                               block_b=block_b, diag=diag)
    # kv block: same rows as q for block-diagonal; full M otherwise
    bkv = block_q if seg_len > 0 else M
    kv_index = ((lambda b, i: (b, i, 0)) if seg_len > 0
                else (lambda b, i: (b, 0, 0)))
    in_specs = [
        pl.BlockSpec((block_b, block_q, C), lambda b, i: (b, i, 0)),
        pl.BlockSpec((block_b, bkv, C), kv_index),
        pl.BlockSpec((block_b, bkv, C), kv_index),
    ]
    operands = [q3, k3, v3]
    if v_int8_in:
        in_specs.append(pl.BlockSpec((block_b, 1, C),
                                     lambda b, i: (b, 0, 0)))
        operands.append(vs3)
    if kv_mask is not None:
        in_specs.append(pl.BlockSpec((block_b, 1, M),
                                     lambda b, i: (b, 0, 0)))
        operands.append(kv_mask.astype(jnp.int32).reshape(B, 1, M))
    if out_col_scale is not None:
        in_specs.append(pl.BlockSpec((1, 1, C), lambda b, i: (0, 0, 0)))
        operands.append(
            out_col_scale.reshape(1, 1, C).astype(jnp.float32))
    cost = pl.CostEstimate(
        flops=4 * B * H * N * bkv * D,
        bytes_accessed=4 * B * N * H * D * q.dtype.itemsize,
        transcendentals=B * H * N * bkv)
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"))
    if emit_int8:
        s1 = pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0))
        out_specs = [
            pl.BlockSpec((1, block_q, C), lambda b, i: (b, i, 0)), s1]
        out_shape = [jax.ShapeDtypeStruct((B, N, C), jnp.int8),
                     jax.ShapeDtypeStruct((B, N, 1), jnp.float32)]
        if not emit_sym:
            out_specs.append(s1)
            out_shape.append(jax.ShapeDtypeStruct((B, N, 1), jnp.float32))
        if need_rowsum:
            out_specs.append(s1)
            out_shape.append(jax.ShapeDtypeStruct((B, N, 1), jnp.float32))
        outs = list(pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((block_q, C), jnp.float32)],
            compiler_params=params, cost_estimate=cost,
        )(*operands))
        codes, scales = outs.pop(0), outs.pop(0)
        zp = None if emit_sym else outs.pop(0)
        rowsum = outs.pop(0) if need_rowsum else None
        return codes, scales, zp, rowsum
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, block_q, C),
                               lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        compiler_params=params,
        cost_estimate=cost,
    )(*operands)
    return out.reshape(B, N, H, D)


def attention_bnhd_int8out(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           scale: float, seg_len: int = 0,
                           kv_mask: Optional[jnp.ndarray] = None,
                           block_q: Optional[int] = None,
                           int8_qk: bool = False, int8_pv: bool = False,
                           emit_sym: bool = True,
                           need_rowsum: bool = False,
                           col_scale: Optional[jnp.ndarray] = None):
    """attention_bnhd that emits its output PRE-QUANTIZED: (int8 codes
    [B, N, C], per-row scales [B, N, 1], zp [B, N, 1] | None,
    rowsum [B, N, 1] | None).

    The proj linear consumes the tuple directly (int8_consumer_matmul), so
    the bf16 attention output never round-trips HBM and the proj skips its
    in-kernel dynamic-quant pass. emit_sym selects symmetric (sym plans) or
    shifted-signed asymmetric (reference dynamic per-token semantics)
    codes; rowsum is emitted for asym proj weights. Inference-only — no
    custom_vjp (the native int8 consumer path has no gradient either).

    col_scale: optional [C] per-channel multiplier applied to the output
    before the row quantize — the consuming proj linear's smooth-quant
    1/cs act rescale (gathered by timerange OUTSIDE the kernel), which
    keeps this int8-emitting path available under CB plans."""
    return _attention_bnhd_impl(q, k, v, kv_mask, scale, seg_len, block_q,
                                int8_qk, int8_pv, emit_int8=True,
                                emit_sym=emit_sym, need_rowsum=need_rowsum,
                                out_col_scale=col_scale)


def attention_ok(n: int, h: int, d: int, seg_len: int = 0,
                 m: Optional[int] = None) -> bool:
    """Whether attention_bnhd handles this shape on the current backend.

    VIDITQ_FORCE_ATTN_KERNEL=1 bypasses the TPU check so CPU tests can
    drive the model-level kernel dispatch under
    pltpu.force_tpu_interpret_mode."""
    import os
    if os.environ.get("VIDITQ_FORCE_ATTN_KERNEL") == "1":
        on_tpu = True
    else:
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
    m = n if m is None else m
    if not (n % 128 == 0 and n >= 128):
        return False
    # one-shot per batch row: k/v [M, H, D] must stay VMEM-resident;
    # larger M takes the kv-streaming kernel (block sizes must divide).
    # VIDITQ_ATTN_STREAM=0 pins the XLA fallback for M > one-shot (A/B).
    if 8 <= m <= ONESHOT_MAX_M:
        return True
    if os.environ.get("VIDITQ_ATTN_STREAM") == "0":
        return False
    bq, bkv = select_stream_blocks(n, m, h * d)
    return bool(bq and bkv and h <= 128)
