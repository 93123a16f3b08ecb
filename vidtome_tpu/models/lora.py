"""LoRA adapter loading: merge low-rank updates into UNet + CLIP params.

The reference delegates to ``pipe.load_lora_weights`` (`generate.py:93-94`
in lixirui142/VidToMe), which applies both the UNet and the text-encoder
components of a LoRA.  Here LoRA safetensors are merged weight-level
(W += scale * (alpha/rank) * B @ A) into our flax param trees — merge-on-
load is the right call for a frozen inference pipeline: zero runtime cost.

Supported key formats:
  * kohya/webui:  lora_unet_<path> / lora_te_<path> (SDXL: lora_te1_ /
                  lora_te2_) with .lora_up.weight / .lora_down.weight /
                  .alpha leaves
  * diffusers/peft: unet.<dotted>.lora_A.weight / lora_B.weight, plus
                  text_encoder.<dotted> / text_encoder_2.<dotted>
"""

from __future__ import annotations

import re
from typing import Any

import jax.numpy as jnp
import numpy as np

from vidtome_tpu.models.convert import (_TEXT_RULES, _UNET_RULES, _rewrite,
                                        load_safetensors)


def _kohya_to_dotted(name: str, mods: tuple[str, ...] | None = None) -> str:
    """lora_unet_down_blocks_0_attentions_0_... -> down_blocks.0.attentions.0...

    ``mods`` is the module-name vocabulary used to place the remaining
    underscore→dot boundaries (longest match first, so e.g.
    "time_emb_proj" wins over the shorter "proj"/"conv")."""
    if name.startswith("lora_unet_"):
        name = name[len("lora_unet_"):]
    if mods is None:
        mods = _UNET_MODS
    name = re.sub(r"_(\d+)(?=_|$)", r".\1", name)
    pat = "|".join(sorted(mods, key=len, reverse=True))
    name = re.sub(rf"_({pat})(?=[._]|$)", r".\1", name)
    return name


_UNET_MODS = ("attentions", "resnets", "transformer_blocks", "attn1",
              "attn2", "ff", "to_q", "to_k", "to_v", "to_out", "net",
              "proj", "proj_in", "proj_out", "conv1", "conv2", "conv",
              "time_emb_proj", "downsamplers", "upsamplers")
_TE_MODS = ("encoder", "layers", "self_attn", "q_proj", "k_proj",
            "v_proj", "out_proj", "mlp", "fc1", "fc2")


def _collect_pairs(state: dict[str, np.ndarray]) -> dict[str, dict[str, dict]]:
    """Group lora tensors by namespace ("unet" / "te" / "te2") and target
    module path (diffusers dotted form)."""
    spaces: dict[str, dict[str, dict]] = {"unet": {}, "te": {}, "te2": {}}

    def slot(space: str, dotted: str) -> dict:
        return spaces[space].setdefault(dotted, {})

    for key, value in state.items():
        if key.startswith("lora_unet_") or key.startswith("lora_te"):
            base, leaf = key.split(".", 1)
            if base.startswith("lora_unet_"):
                space, dotted = "unet", _kohya_to_dotted(
                    base[len("lora_unet_"):], _UNET_MODS)
            else:
                prefix = base.split("_", 2)[1]  # te / te1 / te2
                space = "te2" if prefix == "te2" else "te"
                rest = base[len("lora_") + len(prefix) + 1:]
                dotted = _kohya_to_dotted(rest, _TE_MODS)
            entry = slot(space, dotted)
            if leaf == "lora_up.weight":
                entry["up"] = value
            elif leaf == "lora_down.weight":
                entry["down"] = value
            elif leaf == "alpha":
                entry["alpha"] = float(value)
        elif ".lora_A." in key or ".lora_B." in key:
            dotted = key
            space = "unet"
            for prefix, sp in (("unet.", "unet"),
                               ("text_encoder_2.", "te2"),
                               ("text_encoder.", "te"),
                               ("base_model.model.", "unet")):
                if dotted.startswith(prefix):
                    dotted, space = dotted[len(prefix):], sp
                    break
            which = "down" if ".lora_A." in dotted else "up"
            dotted = re.sub(r"\.lora_[AB]\.(default\.)?weight$", "", dotted)
            slot(space, dotted)[which] = value
    return spaces


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


def _merge_pairs(params: Any, pairs: dict[str, dict], rules, scale: float,
                 label: str) -> Any:
    """Return a new param tree with the LoRA deltas merged in."""
    import copy

    params = copy.deepcopy(
        {k: v for k, v in params.items()}) if isinstance(params, dict) else params
    applied, skipped = 0, []
    for dotted, entry in pairs.items():
        delta = _delta(entry, scale)
        if delta is None:
            skipped.append(dotted)
            continue
        flax_path = _rewrite(dotted + ".weight", rules)
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
    print(f"[INFO] LoRA[{label}]: merged {applied} modules"
          + (f", skipped {len(skipped)}" if skipped else ""))
    if skipped[:3]:
        print(f"[WARNING] LoRA[{label}] skipped examples: {skipped[:3]}")
    return params


def merge_lora_state(params: Any, state: dict[str, np.ndarray],
                     scale: float = 1.0) -> Any:
    """Return a new UNet param tree with the LoRA's UNet deltas merged in."""
    pairs = _collect_pairs(state)
    return _merge_pairs(params, pairs["unet"], _UNET_RULES, scale, "unet")


def merge_lora_text_state(params: Any, state: dict[str, np.ndarray],
                          scale: float = 1.0, encoder: int = 1) -> Any:
    """Return a new CLIP param tree with the LoRA's text-encoder deltas
    merged in (``encoder=2`` selects the SDXL lora_te2_/text_encoder_2
    namespace)."""
    pairs = _collect_pairs(state)
    space = "te2" if encoder == 2 else "te"
    return _merge_pairs(params, pairs[space], _TEXT_RULES, scale,
                        f"text_encoder{'_2' if encoder == 2 else ''}")


def apply_lora_bundle(bundle: Any, lora_cfg: dict) -> None:
    """Merge a LoRA described by the config's ``generation.lora`` section
    (``{path: file.safetensors, weight: 1.0}``; the reference passes HF-hub
    args to ``pipe.load_lora_weights``, ours takes a local safetensors
    path) into the bundle's UNet AND text-encoder params, in place."""
    path = lora_cfg.get("path") or lora_cfg.get("weight_name")
    if path is None:
        print("[WARNING] use_lora set but no lora.path given — skipping")
        return
    scale = float(lora_cfg.get("weight", lora_cfg.get("adapter_weights", 1.0)))
    state = load_safetensors(path)
    pairs = _collect_pairs(state)
    if pairs["unet"]:
        bundle.unet_params = _merge_pairs(
            bundle.unet_params, pairs["unet"], _UNET_RULES, scale, "unet")
    if pairs["te"]:
        bundle.text_params = _merge_pairs(
            bundle.text_params, pairs["te"], _TEXT_RULES, scale,
            "text_encoder")
    if pairs["te2"]:
        if bundle.text2_params is None:
            print("[WARNING] LoRA has text_encoder_2 tensors but the model "
                  "has a single text encoder — skipped")
        else:
            bundle.text2_params = _merge_pairs(
                bundle.text2_params, pairs["te2"], _TEXT_RULES, scale,
                "text_encoder_2")


def apply_lora_config(unet_params: Any, lora_cfg: dict) -> Any:
    """Back-compat UNet-only entry point (prefer apply_lora_bundle)."""
    path = lora_cfg.get("path") or lora_cfg.get("weight_name")
    if path is None:
        print("[WARNING] use_lora set but no lora.path given — skipping")
        return unet_params
    scale = float(lora_cfg.get("weight", lora_cfg.get("adapter_weights", 1.0)))
    state = load_safetensors(path)
    return merge_lora_state(unet_params, state, scale)
