"""Shared checkpoint loading for the offline control-model preprocessors
(HED softedge, Anime2Sketch lineart)."""

from __future__ import annotations

import os


def load_state_dict(path: str) -> dict:
    """torch/safetensors state dict from a file or a directory containing
    one (first matching checkpoint file wins)."""
    if os.path.isdir(path):
        for fn in sorted(os.listdir(path)):
            if fn.endswith((".pth", ".pt", ".bin", ".safetensors")):
                path = os.path.join(path, fn)
                break
        else:
            raise FileNotFoundError(f"no checkpoint file under {path}")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}
