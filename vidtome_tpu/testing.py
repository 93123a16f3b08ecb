"""Tiny structurally-real model bundle for tests and the driver dry run.

The tiny bundle uses the same module classes, parameter layouts, and
pipeline code paths as the production SD bundles — only widths, depths,
and the tokenizer are shrunk — so anything that compiles and runs on it
exercises the real executables."""

from __future__ import annotations


def make_tiny_bundle(dtype=None):
    import jax.numpy as jnp

    from vidtome_tpu.models.clip_text import TINY_TEXT, CLIPTextModel
    from vidtome_tpu.models.registry import ModelBundle, _jit_init
    from vidtome_tpu.models.tokenizer import HashTokenizer
    from vidtome_tpu.models.unet import TINY_UNET, UNet2DConditionModel
    from vidtome_tpu.models.vae import AutoencoderKL

    dtype = dtype or jnp.float32

    unet = UNet2DConditionModel(config=TINY_UNET, dtype=dtype)
    x = jnp.zeros((1, 8, 8, 4), dtype)
    ctx = jnp.zeros((1, 16, TINY_TEXT.hidden_size), dtype)
    unet_params = _jit_init(unet, x, jnp.asarray(0), ctx, seed=0)

    vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                        dtype=dtype)
    vae_params = _jit_init(vae, jnp.zeros((1, 64, 64, 3), dtype), seed=1)

    text = CLIPTextModel(cfg=TINY_TEXT)
    text_params = _jit_init(text, jnp.zeros((1, 16), jnp.int32), seed=2)

    return ModelBundle(
        model_key="tiny-test-model", sd_version="1.5",
        unet_config=TINY_UNET, text_config=TINY_TEXT,
        unet_params=unet_params, vae_params=vae_params,
        text_params=text_params,
        tokenizer=HashTokenizer(vocab_size=1000, max_length=16),
        dtype=dtype, random_weights=True,
        vae_channels=((8, 8, 8, 8), 1))
