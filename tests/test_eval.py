"""Eval harness: PSNR/SSIM/temporal metrics sanity."""

import numpy as np

from vidtome_tpu.eval import compare, psnr, ssim, temporal_consistency


def test_psnr_basics():
    a = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
    assert psnr(a, a) == float("inf")
    noisy = np.clip(a + 0.01, 0, 1)
    assert 30 < psnr(a, noisy) < 50
    assert psnr(a, 1 - a) < 15


def test_ssim_identity_and_noise():
    a = np.random.default_rng(1).random((32, 32, 3)).astype(np.float32)
    assert ssim(a, a) > 0.999
    assert ssim(a, np.roll(a, 7, axis=0)) < 0.9


def test_temporal_consistency_static_vs_noise():
    static = np.tile(np.random.default_rng(2).random((1, 32, 32, 3)),
                     (4, 1, 1, 1)).astype(np.float32)
    noise = np.random.default_rng(3).random((4, 32, 32, 3)).astype(np.float32)
    assert temporal_consistency(static) > temporal_consistency(noise)


def test_compare_end_to_end(tmp_path):
    from tests.helpers import make_tiny_video

    a = make_tiny_video(str(tmp_path / "a"), n_frames=4, size=64)
    b = make_tiny_video(str(tmp_path / "b"), n_frames=4, size=64)
    out = compare(a, b, 64, 64)
    assert out["frames"] == 4
    assert out["psnr_mean"] == float("inf")  # identical clips
    assert out["ssim_mean"] > 0.999
