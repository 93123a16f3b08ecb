"""Checkpoint conversion: diffusers/transformers torch layouts -> our params.

Loads Stable Diffusion component checkpoints (safetensors; the layout every
SD release ships in) and rewrites them into the flax param trees of
``models/unet.py``, ``models/vae.py``, ``models/clip_text.py``:

  * conv kernels OIHW -> HWIO,
  * linear weights [out, in] -> [in, out],
  * ``weight`` of norm layers -> ``scale``,
  * diffusers module paths -> our flat names (``down_blocks.0.resnets.1``
    -> ``down_0_resnets_1``; ``to_out.0`` -> ``to_out``; ``ff.net.0.proj``
    -> ``ff.proj_in``; legacy VAE attention ``query/key/value/proj_attn``
    -> ``to_q/to_k/to_v/to_out``).

No torch import is required: safetensors deserializes straight to numpy.
The reference's model factory downloads these from the HF hub
(`utils/utils.py:19-67`); here the user points ``model_key`` at a local
checkpoint directory with the standard subfolder layout
(unet/ vae/ text_encoder/ tokenizer/ scheduler/).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable

import numpy as np

try:
    from safetensors import safe_open
except ImportError:  # pragma: no cover
    safe_open = None


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def load_component_state(model_dir: str, component: str) -> dict[str, np.ndarray]:
    """Load all safetensors shards under ``<model_dir>/<component>/``."""
    comp_dir = os.path.join(model_dir, component)
    state: dict[str, np.ndarray] = {}
    candidates = sorted(
        f for f in os.listdir(comp_dir) if f.endswith(".safetensors"))
    if not candidates:
        raise FileNotFoundError(f"no safetensors in {comp_dir}")
    for fname in candidates:
        state.update(load_safetensors(os.path.join(comp_dir, fname)))
    return state


def _unflatten(flat: dict[str, np.ndarray]) -> dict[str, Any]:
    tree: dict[str, Any] = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


_NORM_HINTS = ("norm", "layer_norm", "ln_")


def _is_norm(key: str) -> bool:
    last_module = key.rsplit(".", 2)[-2] if "." in key else key
    return any(h in last_module for h in _NORM_HINTS)


def _convert_tensor(key: str, value: np.ndarray) -> tuple[str, np.ndarray]:
    """Return (leaf_name, transformed_value) for a torch parameter."""
    leaf = key.rsplit(".", 1)[-1]
    if leaf == "bias":
        return "bias", value
    assert leaf == "weight", key
    if _is_norm(key):
        return "scale", value
    if value.ndim == 4:  # conv OIHW -> HWIO
        return "kernel", value.transpose(2, 3, 1, 0)
    if value.ndim == 2:  # linear [out, in] -> [in, out]
        return "kernel", value.T
    return "scale", value  # 1-D affine that isn't named like a norm


def _rewrite(key: str, rules: list[tuple[str, str]]) -> str | None:
    for pattern, repl in rules:
        new, n = re.subn(pattern, repl, key)
        if n:
            key = new
    return key


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

_UNET_RULES = [
    (r"^time_embedding\.", "time_embedding."),
    (r"^down_blocks\.(\d+)\.resnets\.(\d+)\.", r"down_\1_resnets_\2."),
    (r"^down_blocks\.(\d+)\.attentions\.(\d+)\.", r"down_\1_attentions_\2."),
    (r"^down_blocks\.(\d+)\.downsamplers\.0\.", r"down_\1_downsample."),
    (r"^mid_block\.resnets\.(\d+)\.", r"mid_resnets_\1."),
    (r"^mid_block\.attentions\.0\.", "mid_attentions_0."),
    (r"^up_blocks\.(\d+)\.resnets\.(\d+)\.", r"up_\1_resnets_\2."),
    (r"^up_blocks\.(\d+)\.attentions\.(\d+)\.", r"up_\1_attentions_\2."),
    (r"^up_blocks\.(\d+)\.upsamplers\.0\.", r"up_\1_upsample."),
    (r"transformer_blocks\.(\d+)\.", r"transformer_blocks_\1."),
    (r"to_out\.0\.", "to_out."),
    (r"ff\.net\.0\.proj\.", "ff.proj_in."),
    (r"ff\.net\.2\.", "ff.proj_out."),
]


def convert_unet(state: dict[str, np.ndarray]) -> dict[str, Any]:
    flat: dict[str, np.ndarray] = {}
    for key, value in state.items():
        new = _rewrite(key, _UNET_RULES)
        module, _ = new.rsplit(".", 1)
        leaf, tensor = _convert_tensor(key, value)
        flat[module.replace(".", "/") + "/" + leaf] = tensor
    return _unflatten(flat)


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

_VAE_RULES = [
    (r"^(encoder|decoder)\.down_blocks\.(\d+)\.resnets\.(\d+)\.",
     r"\1.down_\2_resnets_\3."),
    # the flax VAE names the down/up-sampler nn.Conv directly (no inner
    # "conv" child, unlike the UNet's Downsample2D) — consume the ".conv"
    (r"^(encoder|decoder)\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.",
     r"\1.down_\2_downsample."),
    (r"^(encoder|decoder)\.up_blocks\.(\d+)\.resnets\.(\d+)\.",
     r"\1.up_\2_resnets_\3."),
    (r"^(encoder|decoder)\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.",
     r"\1.up_\2_upsample."),
    (r"^(encoder|decoder)\.mid_block\.resnets\.(\d+)\.",
     r"\1.mid_resnets_\2."),
    (r"^(encoder|decoder)\.mid_block\.attentions\.0\.", r"\1.mid_attn."),
    # legacy VAE attention names
    (r"mid_attn\.query\.", "mid_attn.to_q."),
    (r"mid_attn\.key\.", "mid_attn.to_k."),
    (r"mid_attn\.value\.", "mid_attn.to_v."),
    (r"mid_attn\.proj_attn\.", "mid_attn.to_out."),
    (r"to_out\.0\.", "to_out."),
]


def convert_vae(state: dict[str, np.ndarray]) -> dict[str, Any]:
    flat: dict[str, np.ndarray] = {}
    for key, value in state.items():
        new = _rewrite(key, _VAE_RULES)
        module, _ = new.rsplit(".", 1)
        # legacy VAE attention projections are stored conv-style [C, C, 1, 1]
        # — convert from the ORIGINAL [out, in, 1, 1] layout to [in, out]
        # (not from the HWIO-transposed tensor, whose leading dims are 1).
        if value.ndim == 4 and value.shape[2:] == (1, 1) and (
                "to_q" in new or "to_k" in new or "to_v" in new
                or "to_out" in new):
            leaf = "kernel"
            tensor = value.reshape(value.shape[0], value.shape[1]).T
        else:
            leaf, tensor = _convert_tensor(key, value)
        flat[module.replace(".", "/") + "/" + leaf] = tensor
    return _unflatten(flat)


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------

_TEXT_RULES = [
    (r"^text_model\.embeddings\.token_embedding\.", "token_embedding."),
    (r"^text_model\.encoder\.layers\.(\d+)\.", r"layers_\1."),
    (r"^text_model\.final_layer_norm\.", "final_layer_norm."),
    (r"mlp\.fc(\d)\.", r"fc\1."),
]


def convert_text_encoder(state: dict[str, np.ndarray]) -> dict[str, Any]:
    flat: dict[str, np.ndarray] = {}
    for key, value in state.items():
        if "position_ids" in key:
            continue
        if key in ("text_projection.weight", "text_model.text_projection.weight"):
            # SDXL text_encoder_2 pooled projection (bias-free linear)
            flat["text_projection/kernel"] = value.T
            continue
        if key == "text_model.embeddings.position_embedding.weight":
            flat["position_embedding"] = value
            continue
        new = _rewrite(key, _TEXT_RULES)
        module, _ = new.rsplit(".", 1)
        leaf, tensor = _convert_tensor(key, value)
        if module.endswith("token_embedding"):
            leaf, tensor = "embedding", value  # [vocab, hidden], no transpose
        flat[module.replace(".", "/") + "/" + leaf] = tensor
    return _unflatten(flat)


# ---------------------------------------------------------------------------
# ControlNet (shares the UNet down/mid structure + zero convs + hint encoder)
# ---------------------------------------------------------------------------

_CONTROLNET_RULES = _UNET_RULES + [
    (r"^controlnet_cond_embedding\.conv_in\.", "cond_embedding.conv_in."),
    (r"^controlnet_cond_embedding\.blocks\.(\d+)\.", r"cond_embedding.blocks_\1."),
    (r"^controlnet_cond_embedding\.conv_out\.", "cond_embedding.conv_out."),
    (r"^controlnet_down_blocks\.(\d+)\.", r"zero_convs_\1."),
    (r"^controlnet_mid_block\.", "mid_zero_conv."),
]


def convert_controlnet(state: dict[str, np.ndarray]) -> dict[str, Any]:
    flat: dict[str, np.ndarray] = {}
    for key, value in state.items():
        new = _rewrite(key, _CONTROLNET_RULES)
        module, _ = new.rsplit(".", 1)
        leaf, tensor = _convert_tensor(key, value)
        flat[module.replace(".", "/") + "/" + leaf] = tensor
    return _unflatten(flat)


def cast_tree(tree: Any, dtype) -> Any:
    import jax

    return jax.tree.map(lambda a: a.astype(dtype), tree)


def scheduler_config(model_dir: str) -> dict | None:
    path = os.path.join(model_dir, "scheduler", "scheduler_config.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None
