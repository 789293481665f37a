"""MMDiT (SD3/Flux-class multimodal DiT) backbone with quant-aware linears.

The BASELINE stretch config ("Flux/SD3-class MMDiT W4A8 — new, stretch
qdiff to modern rectified-flow DiTs"; /root/repo/BASELINE.json configs[4]).
No reference implementation exists in /root/reference — this follows the
published SD3 architecture (arXiv 2403.03206): dual-stream blocks where
image and text tokens carry separate weights but attend jointly, adaLN-Zero
modulation from (timestep + pooled text), rectified-flow sampling.

Layer naming keeps the framework convention so quant plans resolve:
  blocks.N.img_attn.{q,k,v,proj}, blocks.N.txt_attn.{q,k,v,proj},
  blocks.N.img_mlp.{fc1,fc2}, blocks.N.txt_mlp.{fc1,fc2}
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from viditq_tpu.models.layers import (
    LayerNorm, Mlp, PatchEmbed, Resolver, TimestepEmbedder, sdpa,
    get_2d_sincos_pos_embed, modulate, no_quant)
from viditq_tpu.quant.qlinear import QuantCtx, QuantLinear


class _StreamAttnProj(nn.Module):
    """Per-stream qkv projections for joint attention.

    q/k/v share their input, so on the plain native-dynamic path the row
    quantization runs ONCE (shared_prequant) instead of three times —
    same policy as SelfAttention (layers.py:335-339)."""

    dim: int
    resolver: Resolver = no_quant
    prefix: str = ""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, qctx=None, prequant=None):
        kw = dict(dtype=self.dtype)
        specs = [self.resolver(f"{self.prefix}.{n}") for n in ("q", "k", "v")]
        pre = prequant
        if (pre is None and qctx is not None and qctx.mode == "quant"
                and all(s == specs[0] for s in specs)):
            from viditq_tpu.quant.qlinear import shared_prequant
            pre = shared_prequant(x, specs[0])
        q = QuantLinear(self.dim, lspec=specs[0],
                        name="q", **kw)(x, qctx, prequant=pre)
        k = QuantLinear(self.dim, lspec=specs[1],
                        name="k", **kw)(x, qctx, prequant=pre)
        v = QuantLinear(self.dim, lspec=specs[2],
                        name="v", **kw)(x, qctx, prequant=pre)
        return q, k, v


class MMDiTBlock(nn.Module):
    """Dual-stream joint-attention block (SD3 fig. 2)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    resolver: Resolver = no_quant
    prefix: str = ""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img, txt, c, qctx: Optional[QuantCtx] = None):
        C, H = self.hidden_size, self.num_heads
        D = C // H
        B, N_i, _ = img.shape
        N_t = txt.shape[1]

        # per-stream adaLN-Zero modulation (6 params each)
        mods = nn.Dense(12 * C, dtype=self.dtype, name="adaLN_linear")(
            nn.silu(c))
        (i_shift, i_scale, i_gate, i_shift2, i_scale2, i_gate2,
         t_shift, t_scale, t_gate, t_shift2, t_scale2, t_gate2) = jnp.split(
             mods, 12, axis=-1)

        def _img_prequant(inp, shift, scale, spec_names):
            """Fused LN + adaLN modulate + row-quantize producer for the
            img stream — same kernel and gating as STDiTBlock
            (stdit.py:62-88; kernels/fused_matmul.py ln_modulate_quantize).
            The txt stream (N_t=77, not a 256-multiple) keeps the unfused
            path; it is <2% of the tokens."""
            import os
            if os.environ.get("VIDITQ_FUSE_PRODUCER", "1") != "1":
                return None
            if qctx is None or qctx.mode != "quant":
                return None
            specs = [self.resolver(f"{self.prefix}.{n}") for n in spec_names]
            s0 = specs[0]
            if (s0 is None or any(s != s0 for s in specs)
                    or s0.backend != "native" or s0.impl != "fused"
                    or s0.act is None or not s0.act.dynamic
                    or not s0.act_quant or not s0.weight_quant
                    or s0.smooth_quant.enable or qctx.capture
                    or inp.shape[1] % 256 != 0):
                return None
            from viditq_tpu.kernels.fused_matmul import (fused_available,
                                                         ln_modulate_quantize)
            if not fused_available():
                return None
            return ln_modulate_quantize(
                inp, shift, scale, sym=s0.act.sym,
                need_rowsum=not (s0.weight is not None and s0.weight.sym))

        pre_img_attn = _img_prequant(
            img, i_shift, i_scale,
            ("img_attn.q", "img_attn.k", "img_attn.v"))
        img_m = modulate(LayerNorm(dtype=self.dtype, name="img_norm1")(img),
                         i_shift, i_scale)
        txt_m = modulate(LayerNorm(dtype=self.dtype, name="txt_norm1")(txt),
                         t_shift, t_scale)
        qi, ki, vi = _StreamAttnProj(
            C, self.resolver, f"{self.prefix}.img_attn",
            self.dtype, name="img_attn")(img_m, qctx, prequant=pre_img_attn)
        qt, kt, vt = _StreamAttnProj(C, self.resolver,
                                     f"{self.prefix}.txt_attn",
                                     self.dtype, name="txt_attn")(txt_m, qctx)
        # joint attention over concatenated [txt; img] tokens
        q = jnp.concatenate([qt, qi], axis=1)
        k = jnp.concatenate([kt, ki], axis=1)
        v = jnp.concatenate([vt, vi], axis=1)
        N = N_t + N_i
        q = q.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        # Joint N (e.g. 77 + 4096 = 4173 at 1024px) is rarely a 128-multiple,
        # which would force the XLA fallback materializing [B,H,N,N] fp32
        # scores (2.2 GB at 1024px). Pad to a 256-multiple with a kv padding
        # mask so the Pallas flash kernel engages; padded query rows are
        # sliced away, padded kv rows are masked out via segment ids.
        pad = 0 if N % 128 == 0 else (-N) % 256
        if pad and N >= 128:
            zpad = ((0, 0), (0, 0), (0, pad), (0, 0))
            q, k, v = (jnp.pad(a, zpad) for a in (q, k, v))
            kv_mask = jnp.broadcast_to(
                (jnp.arange(N + pad) < N)[None], (B, N + pad)).astype(
                    jnp.int32)
            out = sdpa(q, k, v, scale=D ** -0.5, kv_mask=kv_mask)
            out = out[:, :, :N]
        else:
            out = sdpa(q, k, v, scale=D ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        txt_o, img_o = out[:, :N_t], out[:, N_t:]

        img = img + i_gate[:, None] * QuantLinear(
            C, lspec=self.resolver(f"{self.prefix}.img_attn.proj"),
            name="img_attn_proj", dtype=self.dtype)(img_o, qctx)
        txt = txt + t_gate[:, None] * QuantLinear(
            C, lspec=self.resolver(f"{self.prefix}.txt_attn.proj"),
            name="txt_attn_proj", dtype=self.dtype)(txt_o, qctx)

        pre_img_mlp = _img_prequant(img, i_shift2, i_scale2,
                                    ("img_mlp.fc1",))
        img = img + i_gate2[:, None] * Mlp(
            int(C * self.mlp_ratio), resolver=self.resolver,
            prefix=f"{self.prefix}.img_mlp", dtype=self.dtype,
            name="img_mlp")(modulate(
                LayerNorm(dtype=self.dtype, name="img_norm2")(img),
                i_shift2, i_scale2), qctx, prequant=pre_img_mlp)
        txt = txt + t_gate2[:, None] * Mlp(
            int(C * self.mlp_ratio), resolver=self.resolver,
            prefix=f"{self.prefix}.txt_mlp", dtype=self.dtype,
            name="txt_mlp")(modulate(
                LayerNorm(dtype=self.dtype, name="txt_norm2")(txt),
                t_shift2, t_scale2), qctx)
        return img, txt


class MMDiT(nn.Module):
    """Rectified-flow multimodal DiT (SD3-class)."""

    input_size: int = 64
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    caption_channels: int = 4096
    pooled_channels: int = 2048
    model_max_length: int = 77
    resolver: Resolver = no_quant
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, timestep, y, mask=None, y_pooled=None,
                 qctx: Optional[QuantCtx] = None):
        """x: [B, C, H, W]; y: [B, 1, L, C_cap] or [B, L, C_cap] text tokens;
        y_pooled: [B, C_pool] pooled embedding (zeros if None).
        Returns the velocity field [B, C, H, W] (rectified flow).

        Argument order follows the zoo-wide (x, timestep, y, mask, ...)
        convention so registry-built pipelines bind positionally without a
        model-specific adapter."""
        B = x.shape[0]
        C = self.hidden_size
        h = x.shape[-2] // self.patch_size
        w = x.shape[-1] // self.patch_size

        img = PatchEmbed(self.patch_size, C, resolver=self.resolver,
                         dtype=self.dtype,
                         name="x_embedder")(x.astype(self.dtype), qctx)
        img = img + jnp.asarray(
            get_2d_sincos_pos_embed(C, (h, w))[None], self.dtype)
        if y.ndim == 4:
            y = y.reshape(B, -1, y.shape[-1])
        txt = nn.Dense(C, dtype=self.dtype, name="context_embedder")(
            y.astype(self.dtype))
        if mask is not None:
            txt = txt * mask[..., None].astype(txt.dtype)

        t_emb = TimestepEmbedder(C, dtype=self.dtype,
                                 name="t_embedder")(timestep)
        if y_pooled is None:
            y_pooled = jnp.zeros((B, self.pooled_channels), self.dtype)
        pooled = nn.Dense(C, dtype=self.dtype, name="y_embedder")(
            nn.silu(nn.Dense(C, dtype=self.dtype, name="y_embedder_fc1")(
                y_pooled.astype(self.dtype))))
        cond = t_emb + pooled

        for i in range(self.depth):
            img, txt = MMDiTBlock(
                C, self.num_heads, mlp_ratio=self.mlp_ratio,
                resolver=self.resolver, prefix=f"blocks.{i}",
                dtype=self.dtype, name=f"blocks_{i}")(img, txt, cond, qctx)

        mods = nn.Dense(2 * C, dtype=self.dtype, name="final_adaLN")(
            nn.silu(cond))
        shift, scale = jnp.split(mods, 2, axis=-1)
        img = modulate(LayerNorm(dtype=self.dtype, name="norm_final")(img),
                       shift, scale)
        img = nn.Dense(self.patch_size ** 2 * self.in_channels,
                       dtype=self.dtype, name="final_linear")(img)
        img = img.reshape(B, h, w, self.patch_size, self.patch_size,
                          self.in_channels)
        img = jnp.einsum("nhwpqc->nchpwq", img)
        return img.reshape(B, self.in_channels, h * self.patch_size,
                           w * self.patch_size).astype(jnp.float32)


def rectified_flow_sample(model_apply, z, y, mask=None, y_pooled=None,
                          num_steps: int = 20, cfg_scale: float = 4.0,
                          qctx_factory=None,
                          return_trajectory: bool = False):
    """Euler rectified-flow sampler: dx/dt = v(x, t); t from 1 (noise) to 0.

    model_apply(x, t [B] in [0,1000), y, mask, qctx) -> velocity.
    y: [2B, ...] = [cond; null] for CFG.
    """
    ts = jnp.linspace(1.0, 0.0, num_steps + 1)
    B = z.shape[0]

    def step(x, i):
        t0, t1 = ts[i], ts[i + 1]
        t_model = jnp.full((2 * B,), t0 * 999.0, jnp.float32)
        t_id = jnp.clip((t0 * 999.0).astype(jnp.int32), 0, 999)
        qctx = qctx_factory(t_id, i) if qctx_factory is not None else None
        xx = jnp.concatenate([x, x], axis=0)
        v = model_apply(xx, t_model, y, mask, qctx)
        v_c, v_u = jnp.split(v, 2, axis=0)
        v = v_u + cfg_scale * (v_c - v_u)
        x_new = x + (t1 - t0) * v.astype(x.dtype)
        out = (x, t_model[:B].astype(jnp.int32)) if return_trajectory else None
        return x_new, out

    x_final, traj = jax.lax.scan(step, z, jnp.arange(num_steps))
    if return_trajectory:
        return x_final, {"xs": traj[0], "ts": traj[1]}
    return x_final
