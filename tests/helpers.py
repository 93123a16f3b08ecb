"""Shared test fixtures: tiny model bundle + synthetic video."""

from __future__ import annotations

import numpy as np


def make_tiny_bundle(dtype=None):
    import jax
    import jax.numpy as jnp

    from vidtome_tpu.models.clip_text import TINY_TEXT, CLIPTextModel
    from vidtome_tpu.models.registry import ModelBundle
    from vidtome_tpu.models.tokenizer import HashTokenizer
    from vidtome_tpu.models.unet import TINY_UNET, UNet2DConditionModel
    from vidtome_tpu.models.vae import AutoencoderKL

    dtype = dtype or jnp.float32

    from vidtome_tpu.models.registry import _jit_init

    unet = UNet2DConditionModel(config=TINY_UNET, dtype=dtype)
    x = jnp.zeros((1, 8, 8, 4), dtype)
    ctx = jnp.zeros((1, 16, TINY_TEXT.hidden_size), dtype)
    unet_params = _jit_init(unet, x, jnp.asarray(0), ctx, seed=0)

    vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                        dtype=dtype)
    vae_params = _jit_init(vae, jnp.zeros((1, 64, 64, 3), dtype), seed=1)

    text = CLIPTextModel(cfg=TINY_TEXT)
    text_params = _jit_init(text, jnp.zeros((1, 16), jnp.int32), seed=2)

    bundle = ModelBundle(
        model_key="tiny-test-model", sd_version="1.5",
        unet_config=TINY_UNET, text_config=TINY_TEXT,
        unet_params=unet_params, vae_params=vae_params,
        text_params=text_params,
        tokenizer=HashTokenizer(vocab_size=1000, max_length=16),
        dtype=dtype, random_weights=True,
        vae_channels=((8, 8, 8, 8), 1))
    return bundle


def make_tiny_video(path: str, n_frames: int = 8, size: int = 64) -> str:
    """Write a synthetic moving-gradient frame dir; returns the dir path."""
    import os

    from PIL import Image

    os.makedirs(path, exist_ok=True)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for i in range(n_frames):
        phase = i / max(n_frames, 1)
        r = 0.5 + 0.5 * np.sin(2 * np.pi * (xx + phase))
        g = 0.5 + 0.5 * np.cos(2 * np.pi * (yy + phase / 2))
        b = np.full_like(r, 0.3) + 0.2 * phase
        frame = np.stack([r, g, b], -1)
        Image.fromarray((np.clip(frame, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(path, f"{i:04}.png"))
    return path
