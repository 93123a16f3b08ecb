"""Shared test fixtures: tiny model bundle + synthetic video."""

from __future__ import annotations

import numpy as np


def make_tiny_bundle(dtype=None):
    from vidtome_tpu.testing import make_tiny_bundle as _mk

    return _mk(dtype)


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
