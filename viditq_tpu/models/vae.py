"""AutoencoderKL (SD f8 VAE) and frame-wise video wrapper, flax rebuild.

Reference: `t2v/opensora/models/vae/vae.py` wraps diffusers' AutoencoderKL
frame-wise with micro-batching and latent scale 0.18215 (vae.py:10-59);
here the autoencoder itself is implemented natively (diffusers' torch VAE
isn't usable on TPU) with the standard SD architecture so released
`sd-vae-ft-ema` checkpoints convert directly.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                            dtype=self.dtype, name="gn")(x)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = GroupNorm(dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm(dtype=self.dtype, name="norm")(x).reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="v")(h)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k,
                       preferred_element_type=jnp.float32) * (C ** -0.5),
            axis=-1).astype(self.dtype)
        h = jnp.einsum("bnm,bmc->bnc", attn, v)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return x + h.reshape(B, H, W, C)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                h = ResnetBlock(ch, dtype=self.dtype,
                                name=f"down_{i}_block_{j}")(h)
            if i < len(self.block_out_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)), dtype=self.dtype,
                            name=f"down_{i}_downsample")(h)
        ch = self.block_out_channels[-1]
        h = ResnetBlock(ch, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, dtype=self.dtype, name="mid_block_2")(h)
        h = nn.silu(GroupNorm(dtype=self.dtype, name="norm_out")(h))
        h = nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                    dtype=self.dtype, name="conv_out")(h)
        h = nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype,
                    name="quant_conv")(h)
        return h  # [B, H/8, W/8, 2*latent] (mean ++ logvar)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3  # decoder has layers_per_block+1 in diffusers
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        z = nn.Conv(4, (1, 1), dtype=self.dtype, name="post_quant_conv")(z)
        ch = self.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock(ch, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, dtype=self.dtype, name="mid_block_2")(h)
        rev = list(reversed(self.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block):
                h = ResnetBlock(ch, dtype=self.dtype,
                                name=f"up_{i}_block_{j}")(h)
            if i < len(rev) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = nn.silu(GroupNorm(dtype=self.dtype, name="norm_out")(h))
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """SD f8 KL autoencoder; channels-first [B, C, H, W] public API to match
    the reference call sites."""

    latent_channels: int = 4
    scaling_factor: float = 0.18215  # vae.py:38
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(latent_channels=self.latent_channels,
                               dtype=self.dtype)
        self.decoder = Decoder(dtype=self.dtype)

    def encode(self, x, rng: Optional[jnp.ndarray] = None):
        """x: [B, 3, H, W] -> latent [B, 4, H/8, W/8] (sample or mean)."""
        h = self.encoder(x.transpose(0, 2, 3, 1).astype(self.dtype))
        mean, logvar = jnp.split(h, 2, axis=-1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean.transpose(0, 3, 1, 2) * self.scaling_factor

    def decode(self, z):
        """z: [B, 4, h, w] -> [B, 3, 8h, 8w]."""
        z = (z / self.scaling_factor).transpose(0, 2, 3, 1).astype(self.dtype)
        return self.decoder(z).transpose(0, 3, 1, 2)

    def __call__(self, x, rng=None):
        return self.decode(self.encode(x, rng))


class TemporalResnetBlock(nn.Module):
    """Temporal-only residual block: (3,1,1) convs over the frame axis
    (diffusers TemporalResnetBlock as used by the SVD TemporalDecoder).

    Input [B, T, H, W, C]."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((1, 1), (0, 0), (0, 0))
        h = GroupNorm(dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 1, 1), padding=pad,
                    dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 1, 1), padding=pad,
                    dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    """Spatial ResnetBlock + temporal ResnetBlock blended with a learned
    alpha (diffusers SpatioTemporalResBlock, merge_strategy='learned':
    out = a*spatial + (1-a)*temporal, a = sigmoid(mix_factor)).

    Input [B*T, H, W, C] with static num_frames."""

    out_channels: int
    num_frames: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ResnetBlock(self.out_channels, dtype=self.dtype,
                        name="spatial_res_block")(x)
        BT, H, W, C = h.shape
        B = BT // self.num_frames
        hv = h.reshape(B, self.num_frames, H, W, C)
        ht = TemporalResnetBlock(C, dtype=self.dtype,
                                 name="temporal_res_block")(hv)
        mix = self.param("mix_factor", nn.initializers.constant(0.5), (1,),
                         jnp.float32)
        a = jax.nn.sigmoid(mix[0]).astype(h.dtype)
        return (a * hv + (1.0 - a) * ht).reshape(BT, H, W, C)


class TemporalDecoder(nn.Module):
    """SVD-style temporal VAE decoder: the spatial SD decoder topology with
    every resblock a SpatioTemporalResBlock, plus a (3,1,1) conv over
    frames on the RGB output (diffusers TemporalDecoder; consumed by the
    reference via AutoencoderKLTemporalDecoder, vae.py:61-83).

    Input z [B*T, h, w, latent] NHWC; output [B*T, 8h, 8w, out]."""

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    num_frames: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        T = self.num_frames
        ch = self.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        h = SpatioTemporalResBlock(ch, T, dtype=self.dtype,
                                   name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = SpatioTemporalResBlock(ch, T, dtype=self.dtype,
                                   name="mid_block_2")(h)
        rev = list(reversed(self.block_out_channels))
        for i, c in enumerate(rev):
            for j in range(self.layers_per_block + 1):
                h = SpatioTemporalResBlock(c, T, dtype=self.dtype,
                                           name=f"up_{i}_block_{j}")(h)
            if i < len(rev) - 1:
                B2, H2, W2, C2 = h.shape
                h = jax.image.resize(h, (B2, H2 * 2, W2 * 2, C2), "nearest")
                h = nn.Conv(C2, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = nn.silu(GroupNorm(dtype=self.dtype, name="norm_out")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        BT, H2, W2, C2 = h.shape
        hv = h.reshape(BT // T, T, H2, W2, C2)
        hv = nn.Conv(C2, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                     dtype=self.dtype, name="time_conv_out")(hv)
        return hv.reshape(BT, H2, W2, C2)


class VideoAutoencoderKLTemporalDecoder(nn.Module):
    """Reference VideoAutoencoderKLTemporalDecoder (vae.py:61-83): decode
    latents [B, C, T, H, W] through the SVD temporal decoder; encode is
    NotImplemented in the reference too."""

    num_frames: int
    latent_channels: int = 4
    scaling_factor: float = 0.18215
    patch_size: Tuple[int, int, int] = (1, 8, 8)
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    dtype: Any = jnp.float32

    def setup(self):
        self.decoder = TemporalDecoder(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            num_frames=self.num_frames, dtype=self.dtype)

    def encode(self, x, rng=None):
        raise NotImplementedError(
            "the reference temporal-decoder VAE is decode-only (vae.py:69)")

    def decode(self, z):
        B, C, T = z.shape[:3]
        assert T == self.num_frames, (T, self.num_frames)
        flat = (z / self.scaling_factor).transpose(0, 2, 3, 4, 1).reshape(
            B * T, *z.shape[3:], C).astype(self.dtype)
        out = self.decoder(flat)
        C2 = out.shape[-1]
        return out.reshape(B, T, *out.shape[1:3], C2).transpose(0, 4, 1, 2, 3)

    def __call__(self, z):
        return self.decode(z)

    def get_latent_size(self, input_size):
        return [input_size[i] // self.patch_size[i] for i in range(3)]


class VideoAutoencoderKL(nn.Module):
    """Frame-wise video wrapper (vae.py:10-59): [B, C, T, H, W] <->
    [(B T), C, H, W] with micro-batched encode/decode."""

    micro_batch_size: Optional[int] = None
    patch_size: Tuple[int, int, int] = (1, 8, 8)
    dtype: Any = jnp.float32

    def setup(self):
        self.module = AutoencoderKL(dtype=self.dtype)

    def _framewise(self, fn, x):
        B, C, T = x.shape[:3]
        flat = x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, *x.shape[3:])
        mb = self.micro_batch_size
        if mb is None or flat.shape[0] <= mb:
            out = fn(flat)
        else:
            outs = [fn(flat[i:i + mb]) for i in range(0, flat.shape[0], mb)]
            out = jnp.concatenate(outs, axis=0)
        C2 = out.shape[1]
        return out.reshape(B, T, C2, *out.shape[2:]).transpose(0, 2, 1, 3, 4)

    def encode(self, x, rng=None):
        return self._framewise(lambda f: self.module.encode(f, rng), x)

    def decode(self, z):
        return self._framewise(self.module.decode, z)

    def __call__(self, x, rng=None):
        return self.decode(self.encode(x, rng))

    def get_latent_size(self, input_size):
        """vae.py:54-59."""
        return [input_size[i] // self.patch_size[i] for i in range(3)]
