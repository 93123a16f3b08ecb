"""AutoencoderKL (the SD VAE) in Flax — encoder, decoder, 0.18215 scaling.

Owned implementation of the VAE the reference loads from diffusers
(`invert.py:101-115` encode with posterior *mean* x 0.18215; decode with
1/0.18215 then [0,1] clamp, `invert.py:84-98`).  NHWC, bf16 compute with
fp32 norms; the mid-block attention uses the shared attention op.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidtome_tpu.models.layers import _group_norm
from vidtome_tpu.ops.attention import attention

SD_VAE_SCALING = 0.18215


class VAEResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = _group_norm(x, "norm1", silu=True)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = _group_norm(h, "norm2", silu=True)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttentionBlock(nn.Module):
    """Single-head self-attention over spatial positions (VAE mid block)."""

    channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _group_norm(x, "group_norm")
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        # flash path: at 64x64 latents this is 4096 tokens with D=512 — a
        # full-width MXU contraction; the XLA path materializes a 67MB fp32
        # score matrix per frame (the decoder's dominant cost at 512p)
        out = attention(q[:, None], k[:, None], v[:, None])
        out = out[:, 0]
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(B, H, W, C)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                h = VAEResnetBlock(ch, dtype=self.dtype,
                                   name=f"down_{i}_resnets_{j}")(h)
            if i < len(self.block_out_channels) - 1:
                # asymmetric pad (0,1) then stride-2 conv, SD VAE convention
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
        ch = self.block_out_channels[-1]
        h = VAEResnetBlock(ch, dtype=self.dtype, name="mid_resnets_0")(h)
        h = VAEAttentionBlock(ch, dtype=self.dtype, name="mid_attn")(h)
        h = VAEResnetBlock(ch, dtype=self.dtype, name="mid_resnets_1")(h)
        h = _group_norm(h, "conv_norm_out", silu=True)
        moments = nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                          dtype=self.dtype, name="conv_out")(h)
        return moments  # [B, H/8, W/8, 2*latent]: mean | logvar


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, z):
        rev = list(self.block_out_channels)[::-1]
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        h = VAEResnetBlock(rev[0], dtype=self.dtype, name="mid_resnets_0")(h)
        h = VAEAttentionBlock(rev[0], dtype=self.dtype, name="mid_attn")(h)
        h = VAEResnetBlock(rev[0], dtype=self.dtype, name="mid_resnets_1")(h)
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block + 1):
                h = VAEResnetBlock(ch, dtype=self.dtype,
                                   name=f"up_{i}_resnets_{j}")(h)
            if i < len(rev) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = _group_norm(h, "conv_norm_out", silu=True)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = SD_VAE_SCALING   # SDXL: 0.13025
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.encoder = Encoder(self.block_out_channels, self.layers_per_block,
                               self.latent_channels, dtype=self.dtype)
        self.decoder = Decoder(self.block_out_channels, self.layers_per_block,
                               dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

    def encode(self, images: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] in [-1, 1] -> scaled latent mean [B, H/8, W/8, 4]
        (deterministic: posterior mean, reference invert.py:105)."""
        moments = self.quant_conv(self.encoder(images))
        mean = moments[..., : self.latent_channels]
        return mean * self.scaling_factor

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """Scaled latents -> images in [0, 1] (reference invert.py:84-89)."""
        z = self.post_quant_conv(latents / self.scaling_factor)
        imgs = self.decoder(z)
        return jnp.clip(imgs.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)

    def __call__(self, images):
        return self.decode(self.encode(images))
