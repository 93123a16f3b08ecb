"""Native checkpointing: save/load converted model bundles with orbax.

Converting a diffusers-layout checkpoint (models/convert.py) costs a full
safetensors parse + rewrite; this module persists the converted flax param
trees so subsequent runs restore directly:

    save_bundle(bundle, "/ckpts/sd15-native")
    bundle = load_bundle("/ckpts/sd15-native")

The artifact layout also serves as the framework's own distribution format.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_bundle(bundle, path: str) -> None:
    from vidtome_tpu.models.registry import ModelBundle

    assert isinstance(bundle, ModelBundle)
    os.makedirs(path, exist_ok=True)
    meta = {
        "model_key": bundle.model_key,
        "sd_version": bundle.sd_version,
        "dtype": str(jax.numpy.dtype(bundle.dtype)),
        "vae_channels": [list(bundle.vae_channels[0]), bundle.vae_channels[1]],
        "vae_scaling": bundle.vae_scaling,
        "random_weights": bundle.random_weights,
        "has_controlnet": bundle.controlnet_params is not None,
        "has_text2": bundle.text2_params is not None,
    }
    with open(os.path.join(path, "bundle.json"), "w") as f:
        json.dump(meta, f)
    ckptr = _ckptr()
    ckptr.save(os.path.join(path, "unet"), bundle.unet_params, force=True)
    ckptr.save(os.path.join(path, "vae"), bundle.vae_params, force=True)
    ckptr.save(os.path.join(path, "text"), bundle.text_params, force=True)
    if bundle.text2_params is not None:
        ckptr.save(os.path.join(path, "text2"), bundle.text2_params,
                   force=True)
    if bundle.controlnet_params is not None:
        ckptr.save(os.path.join(path, "controlnet"),
                   bundle.controlnet_params, force=True)


def load_bundle(path: str, tokenizer_dir: Optional[str] = None):
    import jax.numpy as jnp

    from vidtome_tpu.models.registry import SD_CONFIGS, ModelBundle
    from vidtome_tpu.models.tokenizer import load_tokenizer

    with open(os.path.join(path, "bundle.json")) as f:
        meta = json.load(f)
    sd_version = meta["sd_version"]
    text2_cfg = None
    if sd_version == "tiny":
        from vidtome_tpu.models.clip_text import TINY_TEXT
        from vidtome_tpu.models.unet import TINY_UNET

        unet_cfg, text_cfg = TINY_UNET, TINY_TEXT
    elif sd_version == "xl":
        from vidtome_tpu.models.clip_text import SDXL_TEXT_1, SDXL_TEXT_2
        from vidtome_tpu.models.unet import SDXL_UNET

        unet_cfg, text_cfg, text2_cfg = SDXL_UNET, SDXL_TEXT_1, SDXL_TEXT_2
    else:
        unet_cfg, text_cfg = SD_CONFIGS[sd_version]
    ckptr = _ckptr()
    unet_params = ckptr.restore(os.path.join(path, "unet"))
    vae_params = ckptr.restore(os.path.join(path, "vae"))
    text_params = ckptr.restore(os.path.join(path, "text"))
    text2_params = None
    if meta.get("has_text2") and os.path.exists(os.path.join(path, "text2")):
        text2_params = ckptr.restore(os.path.join(path, "text2"))
    cn_params = None
    if meta.get("has_controlnet") and os.path.exists(
            os.path.join(path, "controlnet")):
        cn_params = ckptr.restore(os.path.join(path, "controlnet"))

    bundle = ModelBundle(
        model_key=meta["model_key"], sd_version=sd_version,
        unet_config=unet_cfg, text_config=text_cfg,
        unet_params=unet_params, vae_params=vae_params,
        text_params=text_params,
        tokenizer=load_tokenizer(tokenizer_dir,
                                 vocab_size=text_cfg.vocab_size,
                                 max_length=text_cfg.max_positions),
        dtype=jnp.dtype(meta["dtype"]).type,
        random_weights=meta.get("random_weights", False),
        vae_channels=(tuple(meta["vae_channels"][0]),
                      meta["vae_channels"][1]),
        vae_scaling=meta.get("vae_scaling", 0.18215),
        text2_config=text2_cfg, text2_params=text2_params,
        controlnet_params=cn_params,
    )
    if cn_params is not None:
        from vidtome_tpu.models.unet import SD15_UNET

        bundle.controlnet_config = SD15_UNET
    return bundle
