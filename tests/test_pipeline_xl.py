"""SDXL pipeline path end-to-end on a tiny dual-encoder stack:
invert -> generate with pooled-embedding and time-id conditioning."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_tiny_video
from tests.test_pipeline_e2e import _base_config

pytestmark = pytest.mark.slow


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


def test_refiner_bundle_and_text():
    """tiny-refiner stack: single bigG-style encoder provides context AND
    pooled; UNet takes 5 time ids."""
    from vidtome_tpu.models.registry import init_model
    from vidtome_tpu.pipeline.common import TextEncoder

    bundle = init_model(sd_version="tiny-refiner", weight_dtype="fp32")
    assert bundle.is_refiner and bundle.needs_pooled and not bundle.is_xl
    assert bundle.unet_config.addition_num_time_ids == 5
    te = TextEncoder(bundle)
    ctx, pooled = te("a prompt")
    assert ctx.shape[-1] == 16 and pooled.shape[-1] == 16
    ctx2, pooled2 = te.embed_cfg("a prompt", "bad")
    assert ctx2.shape[0] == 2 and pooled2.shape[0] == 2


def test_refiner_unet_forward():
    from vidtome_tpu.models.registry import init_model

    bundle = init_model(sd_version="tiny-refiner", weight_dtype="fp32")
    unet = bundle.make_unet()
    x = jnp.zeros((2, 8, 8, 4), jnp.float32)
    ctx = jnp.zeros((2, 16, 16), jnp.float32)
    pooled = jnp.zeros((2, 16), jnp.float32)
    tids = jnp.asarray([[64.0, 64.0, 0.0, 0.0, 2.5],
                        [64.0, 64.0, 0.0, 0.0, 6.0]], jnp.float32)
    out = unet.apply({"params": bundle.unet_params}, x, jnp.asarray(3), ctx,
                     add_text_embeds=pooled, add_time_ids=tids)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_two_stage_refiner_generation(xl_bundle, tmp_path):
    """Base tiny-XL does the first 80% of the schedule, tiny-refiner the
    rest; output stays finite and differs from the base-only result (the
    refiner stage really ran)."""
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.pipeline.inverter import Inverter

    video = make_tiny_video(str(tmp_path / "v"), n_frames=4, size=64)
    cfg = _base_config(str(tmp_path), video, merge_global=True)
    cfg["sd_version"] = "xl"
    Inverter(xl_bundle, cfg, use_pallas=False)(
        cfg.input_path, cfg.inversion.save_path)

    base_only = Generator(xl_bundle, cfg, use_pallas=False)(
        cfg.input_path, cfg.generation.latents_path,
        cfg.generation.output_path, frame_ids=list(range(4)))["edit"]

    cfg["generation"]["refiner"] = {
        "sd_version": "tiny-refiner", "denoising_start": 0.8,
        "aesthetic_score": 6.0, "negative_aesthetic_score": 2.5}
    gen = Generator(xl_bundle, cfg, use_pallas=False)
    assert gen.refiner is not None
    refined = gen(cfg.input_path, cfg.generation.latents_path,
                  cfg.generation.output_path + "_ref",
                  frame_ids=list(range(4)))["edit"]
    assert refined.shape == base_only.shape
    assert np.isfinite(refined).all()
    assert np.abs(refined - base_only).max() > 1e-6


def test_two_stage_refiner_with_step_caches(xl_bundle, tmp_path):
    """Step caches across a refiner split: the refiner stage samples from
    a mid-schedule start, so its refresh masks must rebuild relative to
    that start (first refiner step refreshes an empty cache)."""
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.pipeline.inverter import Inverter

    video = make_tiny_video(str(tmp_path / "v"), n_frames=4, size=64)
    cfg = _base_config(str(tmp_path), video, merge_global=True)
    cfg["sd_version"] = "xl"
    cfg["generation"]["cache_interval"] = 2
    cfg["generation"]["cfg_interval"] = 2
    cfg["generation"]["refiner"] = {
        "sd_version": "tiny-refiner", "denoising_start": 0.8,
        "aesthetic_score": 6.0, "negative_aesthetic_score": 2.5}
    Inverter(xl_bundle, cfg, use_pallas=False)(
        cfg.input_path, cfg.inversion.save_path)
    gen = Generator(xl_bundle, cfg, use_pallas=False)
    out = gen(cfg.input_path, cfg.generation.latents_path,
              cfg.generation.output_path, frame_ids=list(range(4)))["edit"]
    assert np.isfinite(out).all()


def test_refiner_rejects_non_xl_base(tmp_path):
    """The refiner denoises SDXL-VAE latents; chaining onto an SD1.5 base
    must fail loudly at construction, not corrupt output silently."""
    from tests.helpers import make_tiny_bundle
    from vidtome_tpu.pipeline.generator import Generator

    bundle = make_tiny_bundle()  # non-XL tiny stack
    cfg = _base_config(str(tmp_path), str(tmp_path / "v.mp4"))
    cfg["generation"]["refiner"] = {"sd_version": "tiny-refiner"}
    with pytest.raises(ValueError, match="SDXL base"):
        Generator(bundle, cfg, use_pallas=False)
