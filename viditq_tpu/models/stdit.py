"""STDiT (OpenSora v1.0 spatial-temporal DiT), TPU-native flax rebuild.

Reference: `t2v/opensora/models/stdit/stdit.py`. Differences by design:
  * separate q/k/v linears only (the reference converts fused qkv checkpoints
    at load, stdit.py:460-483; our checkpoint converter does the split).
  * prompt tokens stay dense [B, P, C] with 0-masking plus an additive -inf
    attention bias — numerically equal to the reference's packed varlen
    cross-attn (BlockDiagonalMask, blocks.py:300-304) with static shapes.
  * positional embeddings are baked numpy constants, not buffers.
  * sequence parallelism is handled outside the module by sharding the token
    axis with pjit/shard_map (viditq_tpu.parallel), not by a parallel class.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from viditq_tpu.models.layers import (
    CaptionEmbedder, CrossAttention, LayerNorm, Mlp, PatchEmbed3D, Resolver,
    SelfAttention, T2IFinalLayer, TBlock, TimestepEmbedder,
    get_1d_sincos_pos_embed, get_2d_sincos_pos_embed, no_quant, t2i_modulate)
from viditq_tpu.quant.qlinear import QuantCtx


class STDiTBlock(nn.Module):
    """stdit.py:36-133: spatial attn -> temporal attn -> cross attn -> MLP,
    t2i (adaLN-single) modulation with a per-block scale_shift_table."""

    hidden_size: int
    num_heads: int
    d_s: int
    d_t: int
    mlp_ratio: float = 4.0
    resolver: Resolver = no_quant
    prefix: str = ""
    dtype: Any = jnp.bfloat16
    sp_mesh: Any = None
    sp_mode: str = "auto"

    @nn.compact
    def __call__(self, x, y, t0, mask=None, tpe=None,
                 qctx: Optional[QuantCtx] = None, tpe_gate=None):
        B, N, C = x.shape
        if qctx is not None and qctx.capture:
            # block-granularity IO for joint AdaRound reconstruction
            # (replaces the reference's save_in_out_data block hooks,
            # qdiff/utils.py:228)
            self.sow("intermediates", "block_in", x)
        table = self.param("scale_shift_table",
                           nn.initializers.normal(self.hidden_size ** -0.5),
                           (6, self.hidden_size), jnp.float32)
        mods = (table[None].astype(self.dtype)
                + t0.reshape(B, 6, -1).astype(self.dtype))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            m for m in jnp.split(mods, 6, axis=1)]

        def _ln_mod_prequant(inp, shift, scale, spec_names):
            # shared fused LN+modulate+quantize producer (layers.py
            # ln_mod_prequant — also used by PixArtBlock)
            from viditq_tpu.models.layers import ln_mod_prequant
            return ln_mod_prequant(self, self.resolver, self.prefix, inp,
                                   shift, scale, spec_names, qctx,
                                   sp_mesh=self.sp_mesh)

        # kernel-fused residual epilogues are opt-in (VIDITQ_FUSE_EPILOGUE;
        # measured a net loss on v5e — BENCH_NOTES.md round-2b); the
        # default path keeps the plain external adds XLA fuses best
        import os
        use_epi = os.environ.get("VIDITQ_FUSE_EPILOGUE", "0") == "1"

        pre_attn = _ln_mod_prequant(x, shift_msa, scale_msa,
                                    ("attn.q", "attn.k", "attn.v"))
        x_m = t2i_modulate(LayerNorm(dtype=self.dtype, name="norm1")(x),
                           shift_msa, scale_msa)
        # spatial branch: [B, (T S), C] -> [(B T), S, C]
        x_s = x_m.reshape(B * self.d_t, self.d_s, C)
        attn_mod = SelfAttention(
            C, self.num_heads, resolver=self.resolver,
            prefix=f"{self.prefix}.attn", dtype=self.dtype,
            token_layout="spatial", d_t=self.d_t, d_s=self.d_s,
            sp_mesh=self.sp_mesh, sp_mode=self.sp_mode, name="attn")
        if use_epi:
            x = attn_mod(x_s, qctx, prequant=pre_attn,
                         epilogue=(x, gate_msa.reshape(B, C))
                         ).reshape(B, N, C)
        else:
            x_s = attn_mod(x_s, qctx, prequant=pre_attn)
            x = x + gate_msa * x_s.reshape(B, N, C)

        # temporal branch: [B, (T S), C] -> [B, S, T, C]
        x_t = x.reshape(B, self.d_t, self.d_s, C).transpose(0, 2, 1, 3)
        if tpe is not None:
            tpe_eff = tpe.astype(self.dtype)
            if tpe_gate is not None:
                # scanned form: tpe applies only where the per-block gate is
                # set (block 0, stdit.py:307-316)
                tpe_eff = tpe_eff * tpe_gate.astype(self.dtype)
            x_t = x_t + tpe_eff[None]
        if self.sp_mesh is None:
            # packed segment form [B, (S T), C], seg_len=T: the temporal
            # attention runs block-diagonally in one layout-native kernel
            # (kernels/attention.py — the [(B S), T, C] form materializes
            # [.., T, T] f32 scores with 8x tile padding through XLA).
            # [B, (S T), C] IS the reference's temporal per-token quant
            # view (stdit_quant_layer.py:159-164), so token_layout is
            # identity here.
            x_t = x_t.reshape(B, self.d_s * self.d_t, C)
            x_t = SelfAttention(
                C, self.num_heads, resolver=self.resolver,
                prefix=f"{self.prefix}.attn_temp", dtype=self.dtype,
                seg_len=self.d_t, name="attn_temp")(x_t, qctx)
            x_t = x_t.reshape(B, self.d_s, self.d_t, C)
        else:
            x_t = x_t.reshape(B * self.d_s, self.d_t, C)
            x_t = SelfAttention(
                C, self.num_heads, resolver=self.resolver,
                prefix=f"{self.prefix}.attn_temp", dtype=self.dtype,
                token_layout="temporal", d_t=self.d_t, d_s=self.d_s,
                sp_mesh=self.sp_mesh, sp_mode=self.sp_mode,
                name="attn_temp")(x_t, qctx)
            x_t = x_t.reshape(B, self.d_s, self.d_t, C)
        x_t = x_t.transpose(0, 2, 1, 3)
        x = x + gate_msa * x_t.reshape(B, N, C)

        # cross attention to prompt tokens
        cross_mod = CrossAttention(
            C, self.num_heads, resolver=self.resolver,
            prefix=f"{self.prefix}.cross_attn", dtype=self.dtype,
            name="cross_attn")
        if use_epi:
            x = cross_mod(x, y, mask, qctx, epilogue=(x, None))
        else:
            x = x + cross_mod(x, y, mask, qctx)

        # MLP
        pre_mlp = _ln_mod_prequant(x, shift_mlp, scale_mlp, ("mlp.fc1",))
        mlp_mod = Mlp(
            int(C * self.mlp_ratio), resolver=self.resolver,
            prefix=f"{self.prefix}.mlp", dtype=self.dtype, name="mlp")
        x_mlp_in = t2i_modulate(
            LayerNorm(dtype=self.dtype, name="norm2")(x),
            shift_mlp, scale_mlp)
        if use_epi:
            x = mlp_mod(x_mlp_in, qctx, prequant=pre_mlp,
                        epilogue=(x, gate_mlp.reshape(B, C)))
        else:
            x = x + gate_mlp * mlp_mod(x_mlp_in, qctx, prequant=pre_mlp)
        if qctx is not None and qctx.capture:
            self.sow("intermediates", "block_out", x)
        return x


class STDiT(nn.Module):
    """stdit.py:137-452. input_size is the latent [T, H, W]."""

    input_size: Tuple[int, int, int] = (16, 64, 64)
    in_channels: int = 4
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    pred_sigma: bool = True
    caption_channels: int = 4096
    model_max_length: int = 120
    space_scale: float = 1.0
    time_scale: float = 1.0
    no_temporal_pos_emb: bool = False
    resolver: Resolver = no_quant
    grad_checkpoint: bool = False
    # Ulysses sequence parallelism for the self-attentions (reference
    # SeqParallelAttention): set to a Mesh with an 'sp' axis
    sp_mesh: Any = None
    # Run the depth-28 block stack as ONE nn.scan step (params/quant tables
    # stacked on a leading depth axis). ~depth-x lower compile time; requires
    # a uniform per-block quant config (per-block overrides need the
    # unrolled form). Block layer names lose their index ('blocks.attn.q').
    scan_blocks: bool = False
    sp_mode: str = "auto"
    dtype: Any = jnp.bfloat16

    @property
    def out_channels(self):
        return self.in_channels * 2 if self.pred_sigma else self.in_channels

    @property
    def num_temporal(self):
        return self.input_size[0] // self.patch_size[0]

    @property
    def num_spatial(self):
        return ((self.input_size[1] // self.patch_size[1])
                * (self.input_size[2] // self.patch_size[2]))

    def spatial_pos_embed(self) -> np.ndarray:
        grid = (self.input_size[1] // self.patch_size[1],
                self.input_size[2] // self.patch_size[2])
        return get_2d_sincos_pos_embed(self.hidden_size, grid,
                                       scale=self.space_scale)[None]

    def temporal_pos_embed(self) -> np.ndarray:
        return get_1d_sincos_pos_embed(self.hidden_size, self.num_temporal,
                                       scale=self.time_scale)[None]

    @nn.compact
    def __call__(self, x, timestep, y, mask=None,
                 qctx: Optional[QuantCtx] = None, stage: str = "all",
                 x_tokens=None):
        """x: [B, C, T, H, W]; timestep: [B]; y: [B, 1, L, C_cap] or
        [B, L, C_cap]; mask: [B, L] or [B0, L] with B = 2*B0 (CFG doubling,
        stdit.py:282-297). Returns [B, C_out, T, H, W].

        stage: 'all' (default) is the full forward; 'embed' stops before
        the block stack and returns (x_tokens, t0, y, mask, tpe); 'final'
        takes the block-stack output via x_tokens and runs the head. The
        split lets parallel/pipeline.py run the block stack
        pipeline-parallel while the (cheap) embed/final parts stay
        GSPMD-replicated."""
        B = x.shape[0]
        T, S, C = self.num_temporal, self.num_spatial, self.hidden_size

        if stage == "final":
            t = TimestepEmbedder(C, dtype=self.dtype,
                                 name="t_embedder")(timestep)
            out = T2IFinalLayer(int(np.prod(self.patch_size)),
                                self.out_channels, resolver=self.resolver,
                                dtype=self.dtype,
                                name="final_layer")(x_tokens, t, qctx)
            return self.unpatchify(out).astype(jnp.float32)

        x = PatchEmbed3D(self.patch_size, C, resolver=self.resolver,
                         dtype=self.dtype,
                         name="x_embedder")(x.astype(self.dtype), qctx)
        x = x.reshape(B, T, S, C)
        x = x + jnp.asarray(self.spatial_pos_embed(), self.dtype)
        x = x.reshape(B, T * S, C)

        t = TimestepEmbedder(C, dtype=self.dtype, name="t_embedder")(timestep)
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

        tpe = (None if self.no_temporal_pos_emb
               else jnp.asarray(self.temporal_pos_embed(), self.dtype))
        if stage == "embed":
            return x, t0, y, mask, tpe
        if qctx is not None and qctx.capture:
            # shared per-batch block context for block reconstruction
            self.sow("intermediates", "block_ctx_y", y)
            self.sow("intermediates", "block_ctx_t0", t0)
        if self.scan_blocks:
            gates = jnp.zeros((self.depth, 1, 1), self.dtype).at[0].set(1.0)

            def step(blk, carry, gate):
                return blk(carry, y, t0, mask, tpe, qctx, gate), None

            if self.grad_checkpoint:
                step = nn.remat(step, prevent_cse=False)
            scan = nn.scan(
                step,
                variable_axes={"params": 0, "quant": 0, "qstats": 0,
                               "intermediates": 0},
                split_rngs={"params": True},
                in_axes=0, length=self.depth)
            block = STDiTBlock(
                C, self.num_heads, d_s=S, d_t=T, mlp_ratio=self.mlp_ratio,
                resolver=self.resolver, prefix="blocks.0",
                dtype=self.dtype, sp_mesh=self.sp_mesh,
                sp_mode=self.sp_mode, name="blocks")
            x, _ = scan(block, x, gates)
        else:
            block_cls = (nn.remat(STDiTBlock) if self.grad_checkpoint
                         else STDiTBlock)
            for i in range(self.depth):
                x = block_cls(
                    C, self.num_heads, d_s=S, d_t=T,
                    mlp_ratio=self.mlp_ratio, resolver=self.resolver,
                    prefix=f"blocks.{i}", dtype=self.dtype,
                    sp_mesh=self.sp_mesh, sp_mode=self.sp_mode,
                    name=f"blocks_{i}")(
                        x, y, t0, mask, tpe if i == 0 else None, qctx)

        x = T2IFinalLayer(int(np.prod(self.patch_size)), self.out_channels,
                          resolver=self.resolver, dtype=self.dtype,
                          name="final_layer")(x, t, qctx)
        return self.unpatchify(x).astype(jnp.float32)

    def unpatchify(self, x):
        """[B, N, T_p*H_p*W_p*C_out] -> [B, C_out, T, H, W] (stdit.py:343-365)."""
        n_t = self.input_size[0] // self.patch_size[0]
        n_h = self.input_size[1] // self.patch_size[1]
        n_w = self.input_size[2] // self.patch_size[2]
        t_p, h_p, w_p = self.patch_size
        c = self.out_channels
        B = x.shape[0]
        x = x.reshape(B, n_t, n_h, n_w, t_p, h_p, w_p, c)
        # B N_t N_h N_w T_p H_p W_p C -> B C (N_t T_p) (N_h H_p) (N_w W_p)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(B, c, n_t * t_p, n_h * h_p, n_w * w_p)


def STDiT_XL_2(**kwargs) -> STDiT:
    """stdit.py:454-456."""
    return STDiT(depth=28, hidden_size=1152, patch_size=(1, 2, 2),
                 num_heads=16, **kwargs)
