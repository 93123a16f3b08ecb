"""SDXL pipeline path end-to-end on a tiny dual-encoder stack:
invert -> generate with pooled-embedding and time-id conditioning."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_tiny_video
from tests.test_pipeline_e2e import _base_config


@pytest.fixture(scope="module")
def xl_bundle():
    from vidtome_tpu.models.clip_text import (TINY_TEXT, TINY_TEXT_2,
                                              CLIPTextModel)
    from vidtome_tpu.models.registry import ModelBundle, _jit_init
    from vidtome_tpu.models.tokenizer import HashTokenizer
    from vidtome_tpu.models.unet import TINY_SDXL_UNET, UNet2DConditionModel
    from vidtome_tpu.models.vae import AutoencoderKL

    dtype = jnp.float32
    # tiny XL UNet with cross dim = text1 + text2 widths (32 + 16)
    cfg = dataclasses.replace(TINY_SDXL_UNET, cross_attention_dim=48)
    unet = UNet2DConditionModel(config=cfg, dtype=dtype)
    x = jnp.zeros((1, 8, 8, 4), dtype)
    ctx = jnp.zeros((1, 16, 48), dtype)
    pooled = jnp.zeros((1, 16), dtype)
    tids = jnp.zeros((1, 6), jnp.float32)
    unet_params = _jit_init(unet, x, jnp.asarray(0), ctx,
                            add_text_embeds=pooled, add_time_ids=tids,
                            seed=0)
    vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                        scaling_factor=0.13025, dtype=dtype)
    vae_params = _jit_init(vae, jnp.zeros((1, 64, 64, 3), dtype), seed=1)
    text1 = CLIPTextModel(cfg=TINY_TEXT)
    text1_params = _jit_init(text1, jnp.zeros((1, 16), jnp.int32), seed=2)
    text2 = CLIPTextModel(cfg=TINY_TEXT_2)
    text2_params = _jit_init(text2, jnp.zeros((1, 16), jnp.int32), seed=3)

    return ModelBundle(
        model_key="tiny-xl", sd_version="xl", unet_config=cfg,
        text_config=TINY_TEXT, unet_params=unet_params,
        vae_params=vae_params, text_params=text1_params,
        tokenizer=HashTokenizer(vocab_size=1000, max_length=16),
        dtype=dtype, random_weights=True, vae_channels=((8, 8, 8, 8), 1),
        vae_scaling=0.13025, text2_config=TINY_TEXT_2,
        text2_params=text2_params)


def test_xl_text_encoder_pair(xl_bundle):
    from vidtome_tpu.pipeline.common import TextEncoder

    te = TextEncoder(xl_bundle)
    assert te.is_xl
    ctx, pooled = te("a prompt")
    assert ctx.shape == (1, 16, 48)   # 32 + 16 concat
    assert pooled.shape == (1, 16)
    ctx2, pooled2 = te.embed_cfg("a prompt", "bad")
    assert ctx2.shape == (2, 16, 48)
    assert pooled2.shape == (2, 16)


def test_xl_invert_generate(xl_bundle, tmp_path):
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.pipeline.inverter import Inverter

    video = make_tiny_video(str(tmp_path / "v"), n_frames=6, size=64)
    cfg = _base_config(str(tmp_path), video, merge_global=True)
    cfg["sd_version"] = "xl"
    Inverter(xl_bundle, cfg, use_pallas=False)(
        cfg.input_path, cfg.inversion.save_path)
    out = Generator(xl_bundle, cfg, use_pallas=False)(
        cfg.input_path, cfg.generation.latents_path,
        cfg.generation.output_path, frame_ids=list(range(6)))
    assert out["edit"].shape == (6, 64, 64, 3)
    assert np.isfinite(out["edit"]).all()
