"""Anime lineart extraction for the lineart ControlNet.

The reference delegates lineart preprocessing to ``controlnet_aux``
(`utils/controlnet_utils.py:28-60` in lixirui142/VidToMe), whose
lineart-anime detector is the Anime2Sketch generator: a pix2pix
``UnetGenerator`` (8 downsamplings, ngf 64, InstanceNorm without affine
params, so the checkpoint carries conv weights/biases only).  This module
implements that architecture natively in JAX with a converter for the
standard ``netG.pth`` torch checkpoint layout:

  model.model.0            outermost 4x4/2 downconv (3 -> 64)
  model.model.1.model...   nested UnetSkipConnectionBlock Sequentials
                           (LeakyReLU 0.2 -> downconv -> [norm] -> sub ->
                            ReLU -> upconv -> [norm]); skip = channel cat
  model.model.3            outermost 4x4/2 transposed upconv (128 -> 1)
                           followed by tanh

Set ``VIDTOME_LINEART_MODEL`` to the ``.pth`` checkpoint (or a directory
containing one) to enable; without it the lineart preprocessor falls back
to a warned inverted-edge approximation (`control/preprocess.py`).  Runs
on CPU offline — preprocessing is disk-cached, never on the TPU hot path.
"""

from __future__ import annotations

import os

import numpy as np

NGF = 64
NUM_DOWNS = 8

# channel plan outermost -> innermost: (outer_nc, inner_nc)
_PLAN = [(1, NGF), (NGF, NGF * 2), (NGF * 2, NGF * 4), (NGF * 4, NGF * 8)] \
    + [(NGF * 8, NGF * 8)] * (NUM_DOWNS - 4)


def _conv(x, w, b, stride):
    import jax.lax as lax

    y = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.reshape(1, 1, 1, -1) if b is not None else y


def _conv_transpose(x, w, b):
    """torch ConvTranspose2d(k=4, s=2, p=1): input-dilated conv with the
    spatially-flipped kernel and padding k-1-p = 2."""
    import jax.lax as lax

    y = lax.conv_general_dilated(
        x, w[::-1, ::-1], window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.reshape(1, 1, 1, -1) if b is not None else y


def _instance_norm(x, eps=1e-5):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) / np.sqrt(var + eps) if isinstance(x, np.ndarray) \
        else (x - mean) * (var + eps) ** -0.5


def unet_generator_apply(params: dict, x):
    """params: flax-style nested dict from convert_lineart_state_dict.
    x: [B, H, W, 3] in [-1, 1], H/W multiples of 2^NUM_DOWNS... (256 is
    the detector's working granularity) -> [B, H, W, 1] in [-1, 1]."""
    import jax.numpy as jnp
    from jax import nn as jnn

    def block(level, h):
        p = params[f"block{level}"]
        innermost = level == len(_PLAN) - 1
        outermost = level == 0
        if not outermost:
            h_in = jnn.leaky_relu(h, 0.2)
        else:
            h_in = h
        d = _conv(h_in, p["down"]["kernel"], p["down"].get("bias"), 2)
        if not outermost and not innermost:
            d = _instance_norm(d)
        inner = d if innermost else block(level + 1, d)
        u = _conv_transpose(jnn.relu(inner), p["up"]["kernel"],
                            p["up"].get("bias"))
        if outermost:
            return jnp.tanh(u)
        u = _instance_norm(u)
        return jnp.concatenate([h, u], axis=-1)

    return block(0, x)


def convert_lineart_state_dict(sd: dict) -> dict:
    """pix2pix UnetGenerator torch state dict -> nested conv params.

    torch Sequential indices per block: outermost [0 downconv, 1 sub,
    3 upconv]; middle [1 downconv, 3 sub, 5 upconv]; innermost
    [1 downconv, 3 upconv].  Conv weights are [O, I, kh, kw] -> HWIO;
    ConvTranspose weights are [I, O, kh, kw] -> HWIO (flip applied at
    apply time)."""
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    prefix = "model"
    for level in range(len(_PLAN)):
        outermost = level == 0
        innermost = level == len(_PLAN) - 1
        di = 0 if outermost else 1
        ui = 3 if (outermost or innermost) else 5
        down_w = sd[f"{prefix}.model.{di}.weight"].transpose(2, 3, 1, 0)
        up_w = sd[f"{prefix}.model.{ui}.weight"].transpose(2, 3, 0, 1)
        blk = {"down": {"kernel": down_w}, "up": {"kernel": up_w}}
        for name, idx in (("down", di), ("up", ui)):
            bkey = f"{prefix}.model.{idx}.bias"
            if bkey in sd:
                blk[name]["bias"] = sd[bkey]
        params[f"block{level}"] = blk
        prefix += f".model.{1 if outermost else 3}"
    return params


_cache: dict[str, tuple] = {}


def _get_generator(path: str):
    """(jitted forward, params) — the compiled executable is cached with
    the weights so repeated clips don't re-trace/re-compile."""
    if path not in _cache:
        import jax

        from vidtome_tpu.control.loading import load_state_dict

        params = convert_lineart_state_dict(load_state_dict(path))
        fwd = jax.jit(lambda x: unet_generator_apply(params, x))
        _cache[path] = (fwd, params)
    return _cache[path]


def lineart_edges(images: np.ndarray, model_path: str) -> np.ndarray:
    """[T, H, W, 3] RGB in [0,1] -> lineart maps [T, H, W, 3] in [0,1]
    (dark strokes on white, the Anime2Sketch output convention)."""
    import cv2
    import jax.numpy as jnp

    fwd, _ = _get_generator(model_path)

    T, H, W = images.shape[:3]
    gran = 256  # detector works on 256-multiples (controlnet_aux recipe)
    Hn, Wn = ((H + gran - 1) // gran) * gran, ((W + gran - 1) // gran) * gran

    out = []
    for img in np.asarray(images, np.float32):
        feed = cv2.resize(img, (Wn, Hn), interpolation=cv2.INTER_CUBIC)
        line = fwd(jnp.asarray(feed[None]) * 2.0 - 1.0)
        line = np.asarray(line, np.float32)[0, :, :, 0] * 0.5 + 0.5
        line = cv2.resize(line, (W, H), interpolation=cv2.INTER_CUBIC)
        line = np.clip(line, 0.0, 1.0)
        out.append(np.stack([line] * 3, -1))
    return np.stack(out)


def lineart_model_path() -> str | None:
    p = os.environ.get("VIDTOME_LINEART_MODEL")
    return p if p and os.path.exists(p) else None
