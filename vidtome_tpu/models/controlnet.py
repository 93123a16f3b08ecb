"""ControlNet in Flax: UNet encoder copy + hint embedding + zero convs.

Owned implementation of the conditioning network the reference loads from
diffusers (`utils/utils.py:47-56`, applied via `get_controlnet_kwargs`,
`utils/utils.py:280-295`).  The down/mid trunk mirrors
``UNet2DConditionModel`` exactly (same flat parameter names, so the
converter's UNet rules apply), plus the conditioning embedder and per-skip
zero convolutions.  Returns one residual per UNet skip plus the mid
residual; the UNet adds them (scaled) to its skip connections.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from vidtome_tpu.models.layers import (Downsample2D, ResnetBlock2D,
                                       TimestepEmbedding, Transformer2D,
                                       timestep_embedding)
from vidtome_tpu.models.tome import ToMeCall, ToMeConfig
from vidtome_tpu.models.unet import SD15_UNET, UNetConfig


class ControlNetConditioningEmbedding(nn.Module):
    """Encode the 8x-resolution hint image down to latent resolution
    (convs with stride-2 downsamples; final conv is zero-initialized)."""

    out_channels: int
    block_channels: tuple = (16, 32, 96, 256)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, cond):
        h = nn.Conv(self.block_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(cond)
        h = nn.silu(h)
        idx = 0
        for i in range(len(self.block_channels) - 1):
            h = nn.Conv(self.block_channels[i], (3, 3), padding=1,
                        dtype=self.dtype, name=f"blocks_{idx}")(h)
            h = nn.silu(h)
            idx += 1
            h = nn.Conv(self.block_channels[i + 1], (3, 3), strides=(2, 2),
                        padding=1, dtype=self.dtype, name=f"blocks_{idx}")(h)
            h = nn.silu(h)
            idx += 1
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       name="conv_out")(h)


class ControlNetModel(nn.Module):
    config: UNetConfig = SD15_UNET
    tome: Optional[ToMeConfig] = None   # reference patches ControlNet only
    dtype: Any = jnp.bfloat16           # when include_control=True
    use_pallas: Optional[bool] = None

    def _transformer(self, channels: int, level: int, name: str):
        heads, head_dim = self.config.heads_for(channels)
        return Transformer2D(
            channels=channels, heads=heads, head_dim=head_dim,
            context_dim=self.config.cross_attention_dim,
            depth=self.config.depth_for(level), downsample=2 ** level,
            use_linear_projection=self.config.use_linear_projection,
            tome=self.tome, dtype=self.dtype, use_pallas=self.use_pallas,
            name=name)

    @nn.compact
    def __call__(self, x, t, context, cond,
                 tome_call: Optional[ToMeCall] = None, num_lanes: int = 1,
                 conditioning_scale: float | jnp.ndarray = 1.0):
        cfg = self.config
        B = x.shape[0]
        ch0 = cfg.block_out_channels[0]
        temb = timestep_embedding(t, ch0)
        temb = TimestepEmbedding(ch0 * 4, dtype=self.dtype,
                                 name="time_embedding")(temb.astype(self.dtype))
        temb = jnp.broadcast_to(temb, (B, temb.shape[-1]))

        h = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        h = h + ControlNetConditioningEmbedding(
            ch0, dtype=self.dtype, name="cond_embedding")(cond)
        skips = [h]

        for i, (block_type, ch) in enumerate(
                zip(cfg.down_block_types, cfg.block_out_channels)):
            has_attn = block_type == "CrossAttnDownBlock2D"
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, dtype=self.dtype,
                                  name=f"down_{i}_resnets_{j}")(h, temb)
                if has_attn:
                    h = self._transformer(ch, i, f"down_{i}_attentions_{j}")(
                        h, context, tome_call=tome_call, num_lanes=num_lanes)
                skips.append(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample2D(ch, dtype=self.dtype,
                                 name=f"down_{i}_downsample")(h)
                skips.append(h)

        ch_mid = cfg.block_out_channels[-1]
        mid_level = len(cfg.block_out_channels) - 1
        h = ResnetBlock2D(ch_mid, dtype=self.dtype,
                          name="mid_resnets_0")(h, temb)
        h = self._transformer(ch_mid, mid_level, "mid_attentions_0")(
            h, context, tome_call=tome_call, num_lanes=num_lanes)
        h = ResnetBlock2D(ch_mid, dtype=self.dtype,
                          name="mid_resnets_1")(h, temb)

        down_residuals = []
        for i, skip in enumerate(skips):
            r = nn.Conv(skip.shape[-1], (1, 1),
                        kernel_init=nn.initializers.zeros, dtype=self.dtype,
                        name=f"zero_convs_{i}")(skip)
            down_residuals.append(r * conditioning_scale)
        mid_residual = nn.Conv(ch_mid, (1, 1),
                               kernel_init=nn.initializers.zeros,
                               dtype=self.dtype, name="mid_zero_conv")(h)
        return down_residuals, mid_residual * conditioning_scale
