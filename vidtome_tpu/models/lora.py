"""LoRA adapter loading: merge low-rank updates into UNet params.

The reference delegates to ``pipe.load_lora_weights`` (`generate.py:93-94`
in lixirui142/VidToMe).  Here LoRA safetensors are merged weight-level
(W += scale * (alpha/rank) * B @ A) into our flax param tree — merge-on-
load is the right call for a frozen inference pipeline: zero runtime cost.

Supported key formats:
  * kohya/webui:  lora_unet_<path_with_underscores>.lora_up.weight /
                  .lora_down.weight / .alpha
  * diffusers/peft: unet.<dotted.path>.lora_A.weight / lora_B.weight

Text-encoder LoRAs (lora_te_*) are skipped with a warning for now.
"""

from __future__ import annotations

import re
from typing import Any

import jax.numpy as jnp
import numpy as np

from vidtome_tpu.models.convert import _UNET_RULES, _rewrite, load_safetensors


def _kohya_to_dotted(name: str) -> str:
    """lora_unet_down_blocks_0_attentions_0_... -> down_blocks.0.attentions.0..."""
    name = name[len("lora_unet_"):]
    name = re.sub(r"_(\d+)(?=_|$)", r".\1", name)
    # module boundaries before known leaf/module names; longest first so
    # e.g. "time_emb_proj" is matched before the shorter "proj"/"conv"
    mods = ("attentions", "resnets", "transformer_blocks", "attn1",
            "attn2", "ff", "to_q", "to_k", "to_v", "to_out", "net",
            "proj", "proj_in", "proj_out", "conv1", "conv2", "conv",
            "time_emb_proj", "downsamplers", "upsamplers")
    pat = "|".join(sorted(mods, key=len, reverse=True))
    name = re.sub(rf"_({pat})(?=[._]|$)", r".\1", name)
    return name


def _collect_pairs(state: dict[str, np.ndarray]) -> dict[str, dict]:
    """Group lora tensors by target module path (diffusers dotted form)."""
    pairs: dict[str, dict] = {}

    for key, value in state.items():
        if key.startswith("lora_te"):
            continue
        if key.startswith("lora_unet_"):
            base, leaf = key.rsplit(".", 2)[0], key.split(".", 1)[1]
            dotted = _kohya_to_dotted(base)
            entry = pairs.setdefault(dotted, {})
            if leaf == "lora_up.weight":
                entry["up"] = value
            elif leaf == "lora_down.weight":
                entry["down"] = value
            elif leaf == "alpha":
                entry["alpha"] = float(value)
        elif ".lora_A." in key or ".lora_B." in key:
            dotted = key
            for prefix in ("unet.", "base_model.model."):
                if dotted.startswith(prefix):
                    dotted = dotted[len(prefix):]
            which = "down" if ".lora_A." in dotted else "up"
            dotted = re.sub(r"\.lora_[AB]\.(default\.)?weight$", "", dotted)
            pairs.setdefault(dotted, {})[which] = value
    return pairs


def _delta(entry: dict, scale: float) -> np.ndarray | None:
    up, down = entry.get("up"), entry.get("down")
    if up is None or down is None:
        return None
    rank = down.shape[0]
    alpha = entry.get("alpha", float(rank))
    if up.ndim == 4:  # conv lora: [out, r, 1, 1] @ [r, in, kh, kw]
        up2 = up.reshape(up.shape[0], up.shape[1])
        down2 = down.reshape(down.shape[0], -1)
        w = (up2 @ down2).reshape(up.shape[0], *down.shape[1:])
        w = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    else:
        w = (up @ down).T  # [out,r]@[r,in] -> [in, out]
    return w * (scale * alpha / rank)


def merge_lora_state(params: Any, state: dict[str, np.ndarray],
                     scale: float = 1.0) -> Any:
    """Return a new UNet param tree with the LoRA deltas merged in."""
    import copy

    params = copy.deepcopy(
        {k: v for k, v in params.items()}) if isinstance(params, dict) else params
    pairs = _collect_pairs(state)
    applied, skipped = 0, []
    for dotted, entry in pairs.items():
        delta = _delta(entry, scale)
        if delta is None:
            skipped.append(dotted)
            continue
        flax_path = _rewrite(dotted + ".weight", _UNET_RULES)
        module = flax_path.rsplit(".", 1)[0]
        node = params
        parts = module.split(".")
        ok = True
        for p in parts:
            if not isinstance(node, dict) or p not in node:
                ok = False
                break
            node = node[p]
        if not ok or "kernel" not in node:
            skipped.append(dotted)
            continue
        kernel = node["kernel"]
        if kernel.shape != delta.shape:
            skipped.append(f"{dotted} (shape {delta.shape} vs {kernel.shape})")
            continue
        node["kernel"] = (jnp.asarray(kernel)
                          + jnp.asarray(delta, kernel.dtype))
        applied += 1
    print(f"[INFO] LoRA: merged {applied} modules"
          + (f", skipped {len(skipped)}" if skipped else ""))
    if skipped[:3]:
        print(f"[WARNING] LoRA skipped examples: {skipped[:3]}")
    return params


def apply_lora_config(unet_params: Any, lora_cfg: dict) -> Any:
    """Merge a LoRA described by the config's ``generation.lora`` section:
    ``{path: file.safetensors, weight: 1.0}`` (reference passes HF-hub args;
    ours takes a local safetensors path)."""
    path = lora_cfg.get("path") or lora_cfg.get("weight_name")
    if path is None:
        print("[WARNING] use_lora set but no lora.path given — skipping")
        return unet_params
    scale = float(lora_cfg.get("weight", lora_cfg.get("adapter_weights", 1.0)))
    state = load_safetensors(path)
    return merge_lora_state(unet_params, state, scale)
