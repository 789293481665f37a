"""DiT (class/text-conditional) and Latte (alternating spatial/temporal
blocks) video backbones, TPU-native flax rebuild.

Reference: `t2v/opensora/models/dit/dit.py`, `t2v/opensora/models/latte/
latte.py`. DiTBlock uses adaLN-Zero (per-block adaLN_modulation head) rather
than the shared-table adaLN-single of STDiT/PixArt.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from viditq_tpu.models.layers import (
    CaptionEmbedder, FinalLayer, LabelEmbedder, LayerNorm, Mlp, PatchEmbed3D,
    Resolver, SelfAttention, TimestepEmbedder, get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed, modulate, no_quant)
from viditq_tpu.quant.qlinear import QuantCtx


class DiTBlock(nn.Module):
    """adaLN-Zero block (dit.py:37-72)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    resolver: Resolver = no_quant
    prefix: str = ""
    dtype: Any = jnp.bfloat16
    token_layout: Optional[str] = None
    d_t: int = 1
    d_s: int = 1

    @nn.compact
    def __call__(self, x, c, qctx: Optional[QuantCtx] = None):
        mods = nn.Dense(6 * self.hidden_size, dtype=self.dtype,
                        name="adaLN_linear")(nn.silu(c))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            jnp.split(mods, 6, axis=-1)
        attn_in = modulate(LayerNorm(dtype=self.dtype, name="norm1")(x),
                           shift_msa, scale_msa)
        x = x + gate_msa[:, None] * SelfAttention(
            self.hidden_size, self.num_heads, resolver=self.resolver,
            prefix=f"{self.prefix}.attn", dtype=self.dtype,
            token_layout=self.token_layout, d_t=self.d_t, d_s=self.d_s,
            name="attn")(attn_in, qctx)
        mlp_in = modulate(LayerNorm(dtype=self.dtype, name="norm2")(x),
                          shift_mlp, scale_mlp)
        x = x + gate_mlp[:, None] * Mlp(
            int(self.hidden_size * self.mlp_ratio), resolver=self.resolver,
            prefix=f"{self.prefix}.mlp", dtype=self.dtype,
            token_layout=self.token_layout, d_t=self.d_t, d_s=self.d_s,
            name="mlp")(mlp_in, qctx)
        return x


class DiT(nn.Module):
    """dit.py:75-240. condition='label_<num_classes>' or 'text' (pooled
    caption token)."""

    input_size: Tuple[int, int, int] = (16, 32, 32)
    in_channels: int = 4
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    learn_sigma: bool = True
    condition: str = "text"
    no_temporal_pos_emb: bool = False
    caption_channels: int = 512
    model_max_length: int = 77
    resolver: Resolver = no_quant
    grad_checkpoint: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def out_channels(self):
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def num_temporal(self):
        return self.input_size[0] // self.patch_size[0]

    @property
    def num_spatial(self):
        return ((self.input_size[1] // self.patch_size[1])
                * (self.input_size[2] // self.patch_size[2]))

    @property
    def use_text_encoder(self):
        return not self.condition.startswith("label")

    def _embed_condition(self, t_emb, y):
        if self.use_text_encoder:
            y_emb = CaptionEmbedder(self.caption_channels, self.hidden_size,
                                    token_num=1, dtype=self.dtype,
                                    name="y_embedder")(y.astype(self.dtype))
            y_emb = y_emb.reshape(y_emb.shape[0], -1)[:, : self.hidden_size]
        else:
            num_classes = int(self.condition.split("_")[-1])
            y_emb = LabelEmbedder(num_classes, self.hidden_size,
                                  dtype=self.dtype, name="y_embedder")(y)
        return t_emb + y_emb

    def _embed_x(self, x, qctx=None):
        B = x.shape[0]
        T, S, C = self.num_temporal, self.num_spatial, self.hidden_size
        x = PatchEmbed3D(self.patch_size, C, resolver=self.resolver,
                         dtype=self.dtype,
                         name="x_embedder")(x.astype(self.dtype), qctx)
        x = x.reshape(B, T, S, C)
        grid = self.input_size[1] // self.patch_size[1]
        spe = get_2d_sincos_pos_embed(C, grid)[None]
        x = x + jnp.asarray(spe, self.dtype)
        return x

    def temporal_pos_embed(self):
        return jnp.asarray(
            get_1d_sincos_pos_embed(self.hidden_size, self.num_temporal)[None],
            self.dtype)

    @nn.compact
    def __call__(self, x, timestep, y, mask=None,
                 qctx: Optional[QuantCtx] = None):
        B = x.shape[0]
        T, S, C = self.num_temporal, self.num_spatial, self.hidden_size
        x = self._embed_x(x, qctx)
        if not self.no_temporal_pos_emb:
            x = x.transpose(0, 2, 1, 3) + self.temporal_pos_embed()
            x = x.transpose(0, 2, 1, 3)
        x = x.reshape(B, T * S, C)
        t_emb = TimestepEmbedder(C, dtype=self.dtype,
                                 name="t_embedder")(timestep)
        cond = self._embed_condition(t_emb, y)
        block_cls = nn.remat(DiTBlock) if self.grad_checkpoint else DiTBlock
        for i in range(self.depth):
            x = block_cls(C, self.num_heads, mlp_ratio=self.mlp_ratio,
                          resolver=self.resolver, prefix=f"blocks.{i}",
                          dtype=self.dtype, name=f"blocks_{i}")(x, cond, qctx)
        x = FinalLayer(int(np.prod(self.patch_size)), self.out_channels,
                       dtype=self.dtype, name="final_layer")(x, cond)
        return self.unpatchify(x).astype(jnp.float32)

    def unpatchify(self, x):
        """dit.py:172-180: n t h w r p q c -> n c (t r) (h p) (w q)."""
        t = self.input_size[0] // self.patch_size[0]
        h = self.input_size[1] // self.patch_size[1]
        w = self.input_size[2] // self.patch_size[2]
        pt, ph, pw = self.patch_size
        c = self.out_channels
        B = x.shape[0]
        x = x.reshape(B, t, h, w, pt, ph, pw, c)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(B, c, t * pt, h * ph, w * pw)


class Latte(DiT):
    """latte.py:33-86: same params as DiT; even blocks attend spatially over
    S tokens, odd blocks temporally over T tokens."""

    @nn.compact
    def __call__(self, x, timestep, y, mask=None,
                 qctx: Optional[QuantCtx] = None):
        B = x.shape[0]
        T, S, C = self.num_temporal, self.num_spatial, self.hidden_size
        x = self._embed_x(x, qctx).reshape(B, T * S, C)
        t_emb = TimestepEmbedder(C, dtype=self.dtype,
                                 name="t_embedder")(timestep)
        cond = self._embed_condition(t_emb, y)
        cond_s = jnp.repeat(cond, T, axis=0)  # (b t) d
        cond_t = jnp.repeat(cond, S, axis=0)  # (b s) d
        tpe = self.temporal_pos_embed()
        block_cls = nn.remat(DiTBlock) if self.grad_checkpoint else DiTBlock
        for i in range(self.depth):
            spatial = i % 2 == 0
            if spatial:
                xb = x.reshape(B * T, S, C)
                c = cond_s
                layout = "spatial"
            else:
                xb = (x.reshape(B, T, S, C).transpose(0, 2, 1, 3)
                      .reshape(B * S, T, C))
                if i == 1:
                    xb = xb + tpe
                c = cond_t
                layout = "temporal"
            xb = block_cls(C, self.num_heads, mlp_ratio=self.mlp_ratio,
                           resolver=self.resolver, prefix=f"blocks.{i}",
                           dtype=self.dtype, token_layout=layout,
                           d_t=T, d_s=S, name=f"blocks_{i}")(xb, c, qctx)
            if spatial:
                x = xb.reshape(B, T * S, C)
            else:
                x = (xb.reshape(B, S, T, C).transpose(0, 2, 1, 3)
                     .reshape(B, T * S, C))
        x = FinalLayer(int(np.prod(self.patch_size)), self.out_channels,
                       dtype=self.dtype, name="final_layer")(x, cond)
        return self.unpatchify(x).astype(jnp.float32)


def DiT_XL_2(**kwargs) -> DiT:
    return DiT(depth=28, hidden_size=1152, patch_size=(1, 2, 2),
               num_heads=16, **kwargs)


def Latte_XL_2(**kwargs) -> Latte:
    return Latte(depth=28, hidden_size=1152, patch_size=(1, 2, 2),
                 num_heads=16, **kwargs)
