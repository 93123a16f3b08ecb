"""Conditional UNet for the Stable Diffusion family (1.5 / 2.0 / 2.1 / 2-depth).

Owned Flax implementation of the denoiser the reference loads from
HuggingFace diffusers (SURVEY.md L5, `utils/utils.py:19-67`).  NHWC layout,
bf16 compute, fp32 norms.  Integrates, as explicit call inputs rather than
monkey-patches:

  * cross-frame token merging (``tome_call`` + the ``tome_bank`` variable
    collection) in every transformer block at downsample <= max_downsample;
  * PnP injection flags: source-branch QK sharing on the decoder attention
    blocks the reference patches (up_blocks[1].attn[1,2], up_blocks[2,3].*,
    reference utils/pnp_utils.py:100) and conv-feature injection on
    up_blocks[1].resnets[1] (utils/pnp_utils.py:168-170);
  * ControlNet additive residuals (down/mid), reference utils/utils.py:280-295.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from vidtome_tpu.models.layers import (CrossAttention, Downsample2D,
                                       QConv, ResnetBlock2D,
                                       TimestepEmbedding, Transformer2D,
                                       Upsample2D, _group_norm,
                                       timestep_embedding)
from vidtome_tpu.models.tome import ToMeCall, ToMeConfig


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    num_heads: Optional[int] = 8        # SD1.x: fixed head count per level
    head_dim: Optional[int] = None      # SD2.x/XL: fixed head dim (64)
    transformer_depth: int | Sequence[int] = 1  # per-level when a sequence
    use_linear_projection: bool = False
    down_block_types: Sequence[str] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D")
    up_block_types: Sequence[str] = (
        "UpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D")
    # SDXL addition embeddings: pooled text embed + micro-conditioning
    # time_ids, projected and added to the timestep embedding.
    addition_embed: bool = False
    addition_time_embed_dim: int = 256
    addition_pooled_dim: int = 1280     # pooled text-encoder-2 width
    addition_num_time_ids: int = 6

    def heads_for(self, channels: int) -> tuple[int, int]:
        if self.head_dim is not None:
            return channels // self.head_dim, self.head_dim
        return self.num_heads, channels // self.num_heads

    def depth_for(self, level: int) -> int:
        if isinstance(self.transformer_depth, int):
            return self.transformer_depth
        return self.transformer_depth[level]


SD15_UNET = UNetConfig()
SD21_UNET = UNetConfig(cross_attention_dim=1024, num_heads=None, head_dim=64,
                       use_linear_projection=True)
SD2_DEPTH_UNET = dataclasses.replace(SD21_UNET, in_channels=5)

SDXL_UNET = UNetConfig(
    block_out_channels=(320, 640, 1280),
    cross_attention_dim=2048,
    num_heads=None, head_dim=64,
    transformer_depth=(0, 2, 10),
    use_linear_projection=True,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D",
                      "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                    "UpBlock2D"),
    addition_embed=True,
)

SDXL_REFINER_UNET = UNetConfig(
    # stabilityai/stable-diffusion-xl-refiner-1.0: 4 levels, attention on
    # the middle two (and mid block) at constant 96-wide heads, context
    # from the bigG encoder only (1280), and 5 micro-conditioning time ids
    # (orig size, crop, aesthetic score) instead of the base's 6.
    block_out_channels=(384, 768, 1536, 1536),
    cross_attention_dim=1280,
    num_heads=None, head_dim=96,
    transformer_depth=4,
    use_linear_projection=True,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D",
                      "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D",
                    "CrossAttnUpBlock2D", "UpBlock2D"),
    addition_embed=True, addition_num_time_ids=5,
)

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64), layers_per_block=1, cross_attention_dim=32,
    num_heads=2,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"))

TINY_SDXL_UNET = UNetConfig(
    block_out_channels=(32, 64), layers_per_block=1, cross_attention_dim=32,
    num_heads=2, transformer_depth=(0, 2), use_linear_projection=True,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    addition_embed=True, addition_time_embed_dim=8, addition_pooled_dim=16,
    addition_num_time_ids=6)

TINY_REFINER_UNET = UNetConfig(
    block_out_channels=(32, 64), layers_per_block=1, cross_attention_dim=16,
    num_heads=2, transformer_depth=1, use_linear_projection=True,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    addition_embed=True, addition_time_embed_dim=8, addition_pooled_dim=16,
    addition_num_time_ids=5)


class UNet2DConditionModel(nn.Module):
    config: UNetConfig = SD15_UNET
    tome: Optional[ToMeConfig] = None
    dtype: Any = jnp.bfloat16
    use_pallas: Optional[bool] = None
    # fused Pallas resnet-block dispatch ("off"/"fused") — config key
    # generation.resnet_mode / inversion.resnet_mode
    resnet_mode: str = "off"
    # int8 serving active (dispatch-policy input for the fused kernel)
    resnet_quant: bool = False
    # fused cross-attention sublayer dispatch ("off"/"fused") — config
    # key generation.sublayer_mode / inversion.sublayer_mode
    sublayer_mode: str = "off"

    def _transformer(self, channels: int, level: int, name: str):
        heads, head_dim = self.config.heads_for(channels)
        return Transformer2D(
            channels=channels, heads=heads, head_dim=head_dim,
            context_dim=self.config.cross_attention_dim,
            depth=self.config.depth_for(level),
            downsample=2 ** level,
            use_linear_projection=self.config.use_linear_projection,
            tome=self.tome, dtype=self.dtype, use_pallas=self.use_pallas,
            sublayer_mode=self.sublayer_mode,
            name=name)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                 # [B, H, W, Cin]
        t: jnp.ndarray,                 # scalar timestep
        context: jnp.ndarray,           # [B, Stxt, Dctx]
        tome_call: Optional[ToMeCall] = None,
        attn_inject: Optional[jnp.ndarray] = None,   # traced bool (PnP)
        conv_inject: Optional[jnp.ndarray] = None,   # traced bool (PnP)
        num_lanes: int = 1,
        down_residuals: Optional[Sequence[jnp.ndarray]] = None,  # ControlNet
        mid_residual: Optional[jnp.ndarray] = None,              # ControlNet
        add_text_embeds: Optional[jnp.ndarray] = None,   # SDXL pooled embed
        add_time_ids: Optional[jnp.ndarray] = None,      # SDXL size/crop ids
        cache_mode: str = "off",        # deep-feature cache: off/full/shallow
        deep_cache: Optional[jnp.ndarray] = None,        # [B, H, W, Cdeep]
    ) -> jnp.ndarray:
        """When ``cache_mode`` is "full" the return value is
        ``(eps, deep)`` where ``deep`` is the feature map entering the LAST
        up block (after the preceding upsample) — the temporally-redundant
        deep trunk output.  "shallow" consumes such a ``deep_cache`` from a
        previous timestep and recomputes only the level-0 path around it
        (conv_in + down block 0 + last up block + out head), the
        DeepCache-style training-free acceleration: deep UNet features
        change slowly across adjacent diffusion timesteps, so serving can
        reuse them for a few steps.  The split is exact by construction:
        a "shallow" call fed the deep feature from a "full" call at the
        SAME timestep reproduces that call's output bit-for-bit (tested).
        Static strings — each mode compiles its own executable."""
        cfg = self.config
        B = x.shape[0]
        ch0 = cfg.block_out_channels[0]
        temb = timestep_embedding(t, ch0)
        temb = TimestepEmbedding(ch0 * 4, dtype=self.dtype,
                                 name="time_embedding")(temb.astype(self.dtype))
        temb = jnp.broadcast_to(temb, (B, temb.shape[-1]))

        if cfg.addition_embed:
            # SDXL micro-conditioning: pooled text embed + per-sample
            # time_ids (orig/crop/target sizes), sinusoidally embedded and
            # projected onto the timestep embedding.
            if add_time_ids is None:
                add_time_ids = jnp.zeros((B, cfg.addition_num_time_ids),
                                         jnp.float32)
            if add_text_embeds is None:
                add_text_embeds = jnp.zeros((B, cfg.addition_pooled_dim),
                                            self.dtype)
            ids_emb = timestep_embedding(add_time_ids.reshape(-1),
                                         cfg.addition_time_embed_dim)
            ids_emb = ids_emb.reshape(B, -1).astype(self.dtype)
            aug = jnp.concatenate(
                [add_text_embeds.astype(self.dtype), ids_emb], axis=-1)
            temb = temb + TimestepEmbedding(ch0 * 4, dtype=self.dtype,
                                            name="add_embedding")(aug)

        assert cache_mode in ("off", "full", "shallow"), cache_mode
        run_deep = cache_mode != "shallow"
        n_up = len(cfg.up_block_types)
        if cache_mode != "off" and n_up < 2:
            raise ValueError("deep-feature caching needs >= 2 UNet levels")

        h = QConv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        skips = [h]

        # ---- down blocks ----------------------------------------------------
        # "shallow" runs only down block 0's layers (whose outputs are the
        # skip connections the last up block consumes) and stops before its
        # downsample — everything below the split is served from the cache.
        n_down = len(cfg.block_out_channels) if run_deep else 1
        for i, (block_type, ch) in list(enumerate(
                zip(cfg.down_block_types, cfg.block_out_channels)))[:n_down]:
            has_attn = block_type == "CrossAttnDownBlock2D"
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, dtype=self.dtype,
                                  use_pallas=self.use_pallas,
                                  resnet_mode=self.resnet_mode,
                                  resnet_quant=self.resnet_quant,
                                  name=f"down_{i}_resnets_{j}")(h, temb)
                if has_attn:
                    h = self._transformer(ch, i, f"down_{i}_attentions_{j}")(
                        h, context, tome_call=tome_call, num_lanes=num_lanes)
                skips.append(h)
            if run_deep and i < len(cfg.block_out_channels) - 1:
                h = Downsample2D(ch, dtype=self.dtype,
                                 name=f"down_{i}_downsample")(h)
                skips.append(h)

        if run_deep:
            # ---- mid --------------------------------------------------------
            ch_mid = cfg.block_out_channels[-1]
            mid_level = len(cfg.block_out_channels) - 1
            h = ResnetBlock2D(ch_mid, dtype=self.dtype,
                              use_pallas=self.use_pallas,
                              resnet_mode=self.resnet_mode,
                              resnet_quant=self.resnet_quant,
                              name="mid_resnets_0")(h, temb)
            h = self._transformer(ch_mid, mid_level, "mid_attentions_0")(
                h, context, tome_call=tome_call, num_lanes=num_lanes)
            h = ResnetBlock2D(ch_mid, dtype=self.dtype,
                              use_pallas=self.use_pallas,
                              resnet_mode=self.resnet_mode,
                              resnet_quant=self.resnet_quant,
                              name="mid_resnets_1")(h, temb)

            # ---- ControlNet residuals --------------------------------------
            if mid_residual is not None:
                h = h + mid_residual
            if down_residuals is not None:
                assert len(down_residuals) == len(skips), (
                    f"expected {len(skips)} down residuals, got "
                    f"{len(down_residuals)}")
                skips = [s + r for s, r in zip(skips, down_residuals)]
        elif down_residuals is not None:
            # shallow steps still apply the residuals on the level-0 skips
            # they recompute (the deep residual influence rides the cache)
            skips = [s + r for s, r in zip(skips, down_residuals)]

        # ---- up blocks ------------------------------------------------------
        rev_channels = list(cfg.block_out_channels)[::-1]
        deep_out = None
        start_up = 0 if run_deep else n_up - 1
        if not run_deep:
            assert deep_cache is not None, "shallow mode needs deep_cache"
            h = deep_cache.astype(self.dtype)
        for i, (block_type, ch) in list(enumerate(zip(cfg.up_block_types,
                                                      rev_channels)))[start_up:]:
            has_attn = block_type == "CrossAttnUpBlock2D"
            level = n_up - 1 - i
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                # PnP conv injection: up block 1, resnet 1 only.
                inj = conv_inject if (i == 1 and j == 1) else None
                h = ResnetBlock2D(ch, dtype=self.dtype,
                                  use_pallas=self.use_pallas,
                                  resnet_mode=self.resnet_mode,
                                  resnet_quant=self.resnet_quant,
                                  name=f"up_{i}_resnets_{j}")(
                    h, temb, inject=inj, num_lanes=num_lanes)
                if has_attn:
                    # PnP attention injection: up1.attn[1,2] + all of up2, up3
                    # (reference utils/pnp_utils.py:100 res_dict).
                    pnp_here = (i >= 2) or (i == 1 and j >= 1)
                    inj_a = attn_inject if pnp_here else None
                    h = self._transformer(ch, level, f"up_{i}_attentions_{j}")(
                        h, context, tome_call=tome_call, attn_inject=inj_a,
                        num_lanes=num_lanes)
            if i < n_up - 1:
                h = Upsample2D(ch, dtype=self.dtype,
                               name=f"up_{i}_upsample")(h)
                if i == n_up - 2:
                    deep_out = h  # input of the last up block = the cache cut

        h = _group_norm(h, "conv_norm_out", silu=True)
        h = QConv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                  name="conv_out")(h)
        if cache_mode == "full":
            return h, deep_out
        return h
