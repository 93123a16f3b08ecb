"""Regression: generation must index cached latents by the actual
frame_ids (reference generate.py:128,230), not positionally."""

import os

import numpy as np

from tests.helpers import make_tiny_bundle, make_tiny_video
from tests.test_pipeline_e2e import _base_config


def test_generation_uses_frame_ids_for_latents(tmp_path):
    from vidtome_tpu.io import artifacts
    from vidtome_tpu.pipeline.generator import Generator

    bundle = make_tiny_bundle()
    video = make_tiny_video(str(tmp_path / "v"), n_frames=8, size=64)
    cfg = _base_config(str(tmp_path), video, merge_global=False)

    # fake latent cache for 8 frames with per-frame fingerprints
    lat_dir = artifacts.get_latents_dir(cfg.generation.latents_path,
                                        bundle.model_key)
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((8, 8, 8, 4)).astype(np.float32)
    lat[:, 0, 0, 0] = np.arange(8)  # fingerprint frame index
    t0 = 751  # first timestep of the 4-step schedule
    artifacts.save_latent(lat_dir, t0, lat)

    gen = Generator(bundle, cfg, use_pallas=False)
    frame_ids = [2, 3, 4, 5]
    gen.prepare_data(video, lat_dir, frame_ids)
    got = np.asarray(gen.init_noise, np.float32)[:, 0, 0, 0]
    np.testing.assert_allclose(got[:4], [2, 3, 4, 5], atol=1e-3)
