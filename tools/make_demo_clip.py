"""Generate the bundled demo clip (data/demo.mp4).

The reference ships four real sample videos (``data/*.mp4`` in
lixirui142/VidToMe) so every config runs out of the box.  This zero-egress
rebuild cannot ship real footage, so it synthesizes a deterministic clip
instead: a drifting two-tone gradient sky over rolling hills with a moving
sun and a bouncing ball — enough spatial structure for depth/edge
preprocessors and enough temporal coherence for token merging to matter.

Usage: python tools/make_demo_clip.py [--frames 16] [--size 512]
Writes data/demo.mp4 (deterministic: same pixels every run).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def render_frame(i: int, n: int, size: int) -> np.ndarray:
    """One [size, size, 3] float frame in [0, 1]."""
    t = i / max(n, 1)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size

    # sky: slow horizontal gradient drift
    sky = np.stack([
        0.35 + 0.25 * np.sin(2 * np.pi * (xx * 0.7 + 0.15 * t)),
        0.45 + 0.20 * np.cos(2 * np.pi * (yy * 0.5 + 0.10 * t)),
        0.70 + 0.15 * np.sin(2 * np.pi * (xx * 0.3 - 0.20 * t)),
    ], axis=-1)

    # rolling hills: two sine ridges scrolling at different speeds
    frame = sky
    for amp, speed, base, color in (
            (0.06, 0.30, 0.72, (0.15, 0.45, 0.20)),
            (0.09, 0.55, 0.85, (0.10, 0.30, 0.12))):
        ridge = base + amp * np.sin(2 * np.pi * (xx * 2.0 + speed * t))
        mask = (yy > ridge).astype(np.float32)[..., None]
        frame = frame * (1 - mask) + np.asarray(color, np.float32) * mask

    # sun: bright disc arcing across the sky
    cx, cy = 0.2 + 0.6 * t, 0.25 + 0.08 * np.sin(2 * np.pi * t)
    d2 = (xx - cx) ** 2 + (yy - cy) ** 2
    sun = np.clip(1.0 - d2 / (0.06 ** 2), 0.0, 1.0)[..., None]
    frame = frame * (1 - sun) + np.asarray((1.0, 0.9, 0.55), np.float32) * sun

    # bouncing ball in the foreground
    bx = 0.15 + 0.7 * t
    by = 0.80 - 0.18 * abs(np.sin(2 * np.pi * 1.5 * t))
    d2 = (xx - bx) ** 2 + (yy - by) ** 2
    ball = np.clip(1.0 - d2 / (0.035 ** 2), 0.0, 1.0)[..., None]
    frame = frame * (1 - ball) + np.asarray((0.85, 0.2, 0.15), np.float32) * ball
    return np.clip(frame, 0.0, 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--out", type=str, default="data/demo.mp4")
    args = p.parse_args()

    frames = np.stack([render_frame(i, args.frames, args.size)
                       for i in range(args.frames)])
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    from vidtome_tpu.io.video import save_video

    out_dir = os.path.dirname(args.out) or "."
    path = save_video(frames, out_dir, fps=8)
    final = os.path.join(out_dir, os.path.basename(args.out))
    if path != final:
        os.replace(path, final)
    print(f"[INFO] wrote {final}: {args.frames} frames @ {args.size}p")


if __name__ == "__main__":
    main()
