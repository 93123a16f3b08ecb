"""Holistically-nested edge detection (HED) for softedge control images.

The reference delegates softedge preprocessing to ``controlnet_aux``
models (`utils/controlnet_utils.py:28-60` in lixirui142/VidToMe); that
package is not available here, so this module implements the HED edge
network natively in Flax with a converter for the standard
``ControlNetHED.pth`` torch checkpoint layout (lllyasviel's Annotators
release, Apache-2.0 architecture):

  norm                      (1, 3, 1, 1) input bias, subtracted from the
                            0..255 RGB input
  blockN.convs.i            3x3 conv + ReLU stacks (64/128/256/512/512
                            channels, 2/2/3/3/3 layers, maxpool-2 between
                            blocks)
  blockN.projection         1x1 conv -> 1-channel side output

Detector postprocess (matching the published HED recipe): bilinear-resize
all five side outputs to the input resolution, average, sigmoid; "safe"
variants quantize the edge map to coarse steps so the downstream
ControlNet sees stroke-like bands instead of soft gradients.

Set ``VIDTOME_HED_MODEL`` to a ``.pth`` / ``.safetensors`` checkpoint (or
a directory containing one) to enable; without it, the softedge
preprocessor falls back to a warned Sobel approximation
(`control/preprocess.py`).  Runs on CPU via jax — offline preprocessing,
cached to disk by the pipeline, never on the TPU hot path.
"""

from __future__ import annotations

import os

import numpy as np

_BLOCKS = (("block1", 64, 2), ("block2", 128, 2), ("block3", 256, 3),
           ("block4", 512, 3), ("block5", 512, 3))


def _build_model():
    import flax.linen as nn
    import jax.numpy as jnp

    class _DoubleConvBlock(nn.Module):
        out_ch: int
        layers: int

        @nn.compact
        def __call__(self, x, down_sampling: bool = False):
            if down_sampling:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for i in range(self.layers):
                x = nn.Conv(self.out_ch, (3, 3), padding=1,
                            name=f"conv{i}")(x)
                x = nn.relu(x)
            side = nn.Conv(1, (1, 1), name="projection")(x)
            return x, side

    class HEDNetwork(nn.Module):
        """x: [B, H, W, 3] float RGB in 0..255 -> 5 side outputs
        [B, H/2^k, W/2^k, 1] (pre-sigmoid logits)."""

        @nn.compact
        def __call__(self, x):
            norm = self.param("norm", nn.initializers.zeros, (3,))
            h = x - jnp.asarray(norm)
            sides = []
            for i, (name, ch, layers) in enumerate(_BLOCKS):
                h, side = _DoubleConvBlock(ch, layers, name=name)(
                    h, down_sampling=i > 0)
                sides.append(side)
            return sides

    return HEDNetwork()


def convert_hed_state_dict(sd: dict) -> dict:
    """torch ``ControlNetHED`` state dict -> flax params tree.

    torch conv weights are [O, I, kh, kw]; flax wants [kh, kw, I, O].
    ``norm`` is stored (1, 3, 1, 1).
    """
    params: dict = {"norm": np.asarray(sd["norm"]).reshape(3)}
    for name, _, layers in _BLOCKS:
        block: dict = {}
        for i in range(layers):
            w = np.asarray(sd[f"{name}.convs.{i}.weight"])
            block[f"conv{i}"] = {
                "kernel": w.transpose(2, 3, 1, 0),
                "bias": np.asarray(sd[f"{name}.convs.{i}.bias"]),
            }
        w = np.asarray(sd[f"{name}.projection.weight"])
        block["projection"] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[f"{name}.projection.bias"]),
        }
        params[name] = block
    return params


_cache: dict[str, tuple] = {}


def _get_detector(path: str):
    """(jitted forward, params) — the compiled executable is cached with
    the weights so repeated clips don't re-trace/re-compile."""
    if path not in _cache:
        import jax

        from vidtome_tpu.control.loading import load_state_dict

        params = convert_hed_state_dict(load_state_dict(path))
        model = _build_model()
        fwd = jax.jit(lambda x: model.apply({"params": params}, x))
        _cache[path] = (fwd, params)
    return _cache[path]


def safe_step(x: np.ndarray, step: int = 2) -> np.ndarray:
    """Quantize to ``step`` coarse levels (the *safe processor variants):
    y = floor(x * (step+1)) / step, clipped to [0, 1]."""
    y = np.floor(x.astype(np.float64) * float(step + 1)) / float(step)
    return np.clip(y, 0.0, 1.0).astype(np.float32)


def hed_edges(images: np.ndarray, model_path: str,
              safe: bool = True) -> np.ndarray:
    """[T, H, W, 3] RGB in [0,1] -> softedge maps [T, H, W, 3] in [0,1]."""
    import cv2
    import jax.numpy as jnp

    fwd, _ = _get_detector(model_path)

    out = []
    T, H, W = images.shape[:3]
    for img in np.asarray(images, np.float32):
        sides = fwd(jnp.asarray(img[None] * 255.0))
        maps = [
            cv2.resize(np.asarray(s, np.float32)[0, :, :, 0], (W, H),
                       interpolation=cv2.INTER_LINEAR)
            for s in sides
        ]
        logit = np.clip(np.mean(maps, axis=0, dtype=np.float64), -60., 60.)
        edge = 1.0 / (1.0 + np.exp(-logit))
        if safe:
            edge = safe_step(edge)
        out.append(np.stack([edge] * 3, -1).astype(np.float32))
    return np.stack(out)


def hed_model_path() -> str | None:
    p = os.environ.get("VIDTOME_HED_MODEL")
    return p if p and os.path.exists(p) else None
