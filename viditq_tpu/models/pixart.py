"""PixArt-α / PixArt-Σ (multi-scale) backbones, TPU-native flax rebuild.

Reference: `t2i/diffusion/model/nets/PixArt.py` (+ `PixArtMS.py`,
`PixArt_blocks.py`). PixArtMS is expressed as PixArt with
`micro_condition` / `kv_compress` options; the dense-masked cross-attention
replaces xformers packed varlen (see models/layers.py docstring).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from viditq_tpu.models.layers import (
    CrossAttention, CaptionEmbedder, KVCompressSelfAttention, LayerNorm, Mlp,
    PatchEmbed, Resolver, SelfAttention, SizeEmbedder, T2IFinalLayer, TBlock,
    TimestepEmbedder, get_2d_sincos_pos_embed, no_quant, t2i_modulate)
from viditq_tpu.quant.qlinear import QuantCtx


class PixArtBlock(nn.Module):
    """PixArt.py:25-56: self attn -> cross attn -> MLP, adaLN-single."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    qk_norm: bool = False
    sampling: Optional[str] = None
    sr_ratio: int = 1
    resolver: Resolver = no_quant
    prefix: str = ""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, y, t0, mask=None, HW=None,
                 qctx: Optional[QuantCtx] = None):
        B, N, C = x.shape
        if qctx is not None and qctx.capture:
            self.sow("intermediates", "block_in", x)
        table = self.param("scale_shift_table",
                           nn.initializers.normal(self.hidden_size ** -0.5),
                           (6, self.hidden_size), jnp.float32)
        mods = (table[None].astype(self.dtype)
                + t0.reshape(B, 6, -1).astype(self.dtype))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            jnp.split(mods, 6, axis=1)

        from viditq_tpu.models.layers import ln_mod_prequant
        x_m = t2i_modulate(LayerNorm(dtype=self.dtype, name="norm1")(x),
                           shift_msa, scale_msa)
        if self.sr_ratio > 1 or self.sampling is not None:
            # kv-compressed: k/v consume the DOWNSAMPLED stream — the
            # shared producer only serves same-input consumers, so the
            # attention does its own (shared q + separate kv) quantizes
            attn_out = KVCompressSelfAttention(
                C, self.num_heads, qk_norm=self.qk_norm,
                sampling=self.sampling, sr_ratio=self.sr_ratio,
                resolver=self.resolver, prefix=f"{self.prefix}.attn",
                dtype=self.dtype, name="attn")(x_m, qctx, HW=HW)
        else:
            pre_attn = ln_mod_prequant(
                self, self.resolver, self.prefix, x, shift_msa, scale_msa,
                ("attn.q", "attn.k", "attn.v"), qctx)
            attn_out = SelfAttention(
                C, self.num_heads, qk_norm=self.qk_norm,
                resolver=self.resolver, prefix=f"{self.prefix}.attn",
                dtype=self.dtype, name="attn")(x_m, qctx,
                                               prequant=pre_attn)
        x = x + gate_msa * attn_out
        x = x + CrossAttention(
            C, self.num_heads, resolver=self.resolver,
            prefix=f"{self.prefix}.cross_attn", dtype=self.dtype,
            name="cross_attn")(x, y, mask, qctx)
        pre_mlp = ln_mod_prequant(
            self, self.resolver, self.prefix, x, shift_mlp, scale_mlp,
            ("mlp.fc1",), qctx)
        x = x + gate_mlp * Mlp(
            int(C * self.mlp_ratio), resolver=self.resolver,
            prefix=f"{self.prefix}.mlp", dtype=self.dtype,
            name="mlp")(t2i_modulate(
                LayerNorm(dtype=self.dtype, name="norm2")(x),
                shift_mlp, scale_mlp), qctx, prequant=pre_mlp)
        if qctx is not None and qctx.capture:
            self.sow("intermediates", "block_out", x)
        return x


class PixArt(nn.Module):
    """PixArt.py:63-174 / PixArtMS.py:84-200.

    `input_size` is the latent spatial size (image_size // 8). With
    `micro_condition=True` the Σ-style csize/ar embedders are added; with a
    `kv_compress` config, listed blocks use KV-compressed self-attention
    (PixArt_blocks.py:63-165).
    """

    input_size: int = 64
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    pred_sigma: bool = True
    caption_channels: int = 4096
    model_max_length: int = 120
    pe_interpolation: float = 1.0
    qk_norm: bool = False
    micro_condition: bool = False
    kv_compress_sampling: Optional[str] = None
    kv_compress_scale: int = 1
    kv_compress_layers: Tuple[int, ...] = ()
    resolver: Resolver = no_quant
    grad_checkpoint: bool = False
    # run all blocks as one nn.scan (stacked params; ~depth-x lower compile
    # time) — requires a uniform per-block config, i.e. no kv compression
    scan_blocks: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def out_channels(self):
        return self.in_channels * 2 if self.pred_sigma else self.in_channels

    @property
    def base_size(self):
        return self.input_size // self.patch_size

    def pos_embed(self, h: int, w: int) -> np.ndarray:
        return get_2d_sincos_pos_embed(
            self.hidden_size, (h, w), scale=self.pe_interpolation,
            base_size=self.base_size)[None]

    @nn.compact
    def __call__(self, x, timestep, y, mask=None, data_info=None,
                 qctx: Optional[QuantCtx] = None, stage: str = "all",
                 x_tokens=None):
        """x: [B, C, H, W]; timestep: [B]; y: [B, 1, L, C_cap];
        mask: [B, L] or [B0, L]. Returns [B, C_out, H, W].

        stage: 'all' | 'embed' | 'final' — the block-stack split used by
        parallel/pipeline.py (see models/stdit.py)."""
        B = x.shape[0]
        C = self.hidden_size
        h = x.shape[-2] // self.patch_size
        w = x.shape[-1] // self.patch_size

        if stage == "final":
            t = TimestepEmbedder(C, dtype=self.dtype,
                                 name="t_embedder")(timestep)
            if self.micro_condition:
                csize = SizeEmbedder(C // 3, dtype=self.dtype,
                                     name="csize_embedder")(
                                         data_info["img_hw"], B)
                ar = SizeEmbedder(C // 3, dtype=self.dtype,
                                  name="ar_embedder")(
                                      data_info["aspect_ratio"], B)
                t = t + jnp.concatenate([csize, ar], axis=1)
            out = T2IFinalLayer(self.patch_size ** 2, self.out_channels,
                                resolver=self.resolver, dtype=self.dtype,
                                name="final_layer")(x_tokens, t, qctx)
            return self.unpatchify(out, h, w).astype(jnp.float32)

        x = PatchEmbed(self.patch_size, C, resolver=self.resolver,
                       dtype=self.dtype,
                       name="x_embedder")(x.astype(self.dtype), qctx)
        x = x + jnp.asarray(self.pos_embed(h, w), self.dtype)

        t = TimestepEmbedder(C, dtype=self.dtype, name="t_embedder")(timestep)
        if self.micro_condition:
            assert data_info is not None, "micro_condition needs data_info"
            csize = SizeEmbedder(C // 3, dtype=self.dtype,
                                 name="csize_embedder")(
                                     data_info["img_hw"], B)
            ar = SizeEmbedder(C // 3, dtype=self.dtype, name="ar_embedder")(
                data_info["aspect_ratio"], B)
            t = t + jnp.concatenate([csize, ar], axis=1)
        t0 = TBlock(C, dtype=self.dtype, name="t_block")(t)

        y = CaptionEmbedder(self.caption_channels, C, self.model_max_length,
                            dtype=self.dtype, name="y_embedder")(
                                y.astype(self.dtype))
        if y.ndim == 4:
            y = y.reshape(B, -1, C)
        if mask is not None:
            if mask.shape[0] > B:
                # CFG-doubled [cond; null] mask on a cfg_split half-batch
                # (iddpm.py sample: mask may be [n, L] or [2n, L])
                mask = mask[:B]
            elif mask.shape[0] != B:
                mask = jnp.tile(mask, (B // mask.shape[0], 1))
            y = y * mask[..., None].astype(y.dtype)

        if stage == "embed":
            return x, t0, y, mask, (h, w)
        if qctx is not None and qctx.capture:
            self.sow("intermediates", "block_ctx_y", y)
            self.sow("intermediates", "block_ctx_t0", t0)
        if self.scan_blocks:
            # Blocks scan in CONTIGUOUS UNIFORM RUNS: Σ KV compression
            # applies to a contiguous tail of the stack (reference config
            # kv_compress_layer = [14..27]), so the stack splits into at
            # most a few runs of structurally identical blocks, each run
            # one nn.scan — keeping the ~depth-x compile-time win with
            # non-uniform sr configs.
            def step(blk, carry, _):
                return blk(carry, y, t0, mask, (h, w), qctx), None

            if self.grad_checkpoint:
                step = nn.remat(step, prevent_cse=False)
            runs = []
            for i in range(self.depth):
                sr = (self.kv_compress_scale
                      if i in self.kv_compress_layers else 1)
                if runs and runs[-1][1] == sr:
                    runs[-1][2] += 1
                else:
                    runs.append([i, sr, 1])
            for j, (start, sr, length) in enumerate(runs):
                scan = nn.scan(
                    step,
                    variable_axes={"params": 0, "quant": 0, "qstats": 0,
                                   "intermediates": 0},
                    split_rngs={"params": True},
                    in_axes=0, length=length)
                # multi-run container name carries the run's START block
                # index: flax path 'blocks_14' -> dotted 'blocks.14', so
                # calibrate/pack's per-block name expansion
                # (calibrate.scanned_block_names) yields 'blocks.{14+d}.*'
                # — exactly the unrolled-style names this prefix makes the
                # blocks query at runtime
                name = "blocks" if len(runs) == 1 else f"blocks_{start}"
                block = PixArtBlock(
                    C, self.num_heads, mlp_ratio=self.mlp_ratio,
                    qk_norm=self.qk_norm,
                    sampling=self.kv_compress_sampling if sr > 1 else None,
                    sr_ratio=sr, resolver=self.resolver,
                    prefix=f"blocks.{start}", dtype=self.dtype, name=name)
                x, _ = scan(block, x, jnp.zeros((length, 1), self.dtype))
        else:
            block_cls = (nn.remat(PixArtBlock) if self.grad_checkpoint
                         else PixArtBlock)
            for i in range(self.depth):
                sr = (self.kv_compress_scale
                      if i in self.kv_compress_layers else 1)
                x = block_cls(
                    C, self.num_heads, mlp_ratio=self.mlp_ratio,
                    qk_norm=self.qk_norm,
                    sampling=self.kv_compress_sampling if sr > 1 else None,
                    sr_ratio=sr, resolver=self.resolver,
                    prefix=f"blocks.{i}", dtype=self.dtype,
                    name=f"blocks_{i}")(x, y, t0, mask, (h, w), qctx)

        x = T2IFinalLayer(self.patch_size ** 2, self.out_channels,
                          resolver=self.resolver, dtype=self.dtype,
                          name="final_layer")(x, t, qctx)
        return self.unpatchify(x, h, w).astype(jnp.float32)

    def unpatchify(self, x, h, w):
        """PixArt.py:199-212: [B, N, p*p*C_out] -> [B, C_out, H, W]."""
        p, c = self.patch_size, self.out_channels
        B = x.shape[0]
        x = x.reshape(B, h, w, p, p, c)
        x = jnp.einsum("nhwpqc->nchpwq", x)
        return x.reshape(B, c, h * p, w * p)


def PixArt_XL_2(**kwargs) -> PixArt:
    return PixArt(depth=28, hidden_size=1152, patch_size=2, num_heads=16,
                  **kwargs)


def PixArtMS_XL_2(**kwargs) -> PixArt:
    """Σ-style multi-scale variant (PixArtMS.py:84)."""
    kwargs.setdefault("micro_condition", False)
    return PixArt(depth=28, hidden_size=1152, patch_size=2, num_heads=16,
                  **kwargs)
