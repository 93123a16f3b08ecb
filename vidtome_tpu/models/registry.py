"""Model factory: SD version -> configs + parameters (reference
`utils/utils.py:19-67` ``init_model``).

In the reference this downloads from the HuggingFace hub.  Here
``model_key`` points at a local checkpoint directory with the standard SD
layout (unet/ vae/ text_encoder/ tokenizer/ scheduler/, safetensors); when
absent, models are randomly initialized (clearly warned — used for
weight-free development, testing and kernel benchmarking in zero-egress
environments)."""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from vidtome_tpu.models import convert
from vidtome_tpu.models.clip_text import (SD15_TEXT, SD21_TEXT,
                                          CLIPTextConfig, CLIPTextModel)
from vidtome_tpu.models.controlnet import ControlNetModel
from vidtome_tpu.models.tokenizer import load_tokenizer
from vidtome_tpu.models.tome import ToMeConfig
from vidtome_tpu.models.unet import (SD15_UNET, SD21_UNET, SD2_DEPTH_UNET,
                                     UNet2DConditionModel, UNetConfig)
from vidtome_tpu.models.vae import AutoencoderKL

SD_MODEL_KEYS = {
    "2.1": "stable-diffusion-2-1-base",
    "2.0": "stable-diffusion-2-base",
    "1.5": "stable-diffusion-v1-5",
    "depth": "stable-diffusion-2-depth",
    "xl": "stable-diffusion-xl-base-1.0",
    "xl-refiner": "stable-diffusion-xl-refiner-1.0",
}

SD_CONFIGS: dict[str, tuple[UNetConfig, CLIPTextConfig]] = {
    "1.5": (SD15_UNET, SD15_TEXT),
    "2.0": (SD21_UNET, SD21_TEXT),
    "2.1": (SD21_UNET, SD21_TEXT),
    "depth": (SD2_DEPTH_UNET, SD21_TEXT),
    # weight-free smoke-test stack (random weights, tiny shapes)
    "tiny": (None, None),  # resolved in init_model
    "xl": (None, None),    # resolved in init_model (dual text encoders)
    # SDXL refiner: bigG text encoder only, aesthetic-score conditioning;
    # used as the second stage of a two-stage denoise split
    "xl-refiner": (None, None),
    "tiny-refiner": (None, None),
}

# VAE channel stacks per version ('tiny' shrinks everything; all real SD
# versions share the standard AutoencoderKL).
VAE_CHANNELS = {
    "tiny": ((8, 8, 8, 8), 1),
    "default": ((128, 256, 512, 512), 2),
}

# ControlNet checkpoints keyed by control type (reference
# utils/controlnet_utils.py:17-25); resolved under <controlnet_root>/<name>.
CONTROLNET_DICT = {
    "tile": "control_v11f1e_sd15_tile",
    "ip2p": "control_v11e_sd15_ip2p",
    "openpose": "control_v11p_sd15_openpose",
    "softedge": "control_v11p_sd15_softedge",
    "depth": "control_v11f1p_sd15_depth",
    "lineart_anime": "control_v11p_sd15s2_lineart_anime",
    "canny": "control_v11p_sd15_canny",
}


@dataclasses.dataclass
class ModelBundle:
    """Static configs + parameters for one SD stack.

    Module objects are constructed on demand (they are cheap, and the
    generation stage wants its own ToMe-configured UNet sharing the same
    parameters)."""

    model_key: str
    sd_version: str
    unet_config: UNetConfig
    text_config: CLIPTextConfig
    unet_params: Any
    vae_params: Any
    text_params: Any
    tokenizer: Any
    dtype: Any = jnp.bfloat16
    controlnet_params: Any = None
    controlnet_config: Optional[UNetConfig] = None
    random_weights: bool = False
    vae_channels: tuple = VAE_CHANNELS["default"]
    vae_scaling: float = 0.18215           # SDXL: 0.13025
    # SDXL second text encoder (OpenCLIP bigG: penultimate states + pooled)
    text2_config: Optional[CLIPTextConfig] = None
    text2_params: Any = None

    @property
    def use_depth(self) -> bool:
        return self.sd_version == "depth"

    @property
    def is_xl(self) -> bool:
        return self.text2_config is not None

    @property
    def is_refiner(self) -> bool:
        """SDXL refiner: single (bigG) text encoder, pooled conditioning,
        5 time ids (incl. aesthetic score)."""
        return self.sd_version.endswith("refiner")

    @property
    def needs_pooled(self) -> bool:
        """UNet takes add_text_embeds/add_time_ids (SDXL family)."""
        return self.is_xl or self.is_refiner

    def make_unet(self, tome: Optional[ToMeConfig] = None,
                  use_pallas: Optional[bool] = None,
                  resnet_mode: str = "off",
                  resnet_quant: bool = False,
                  sublayer_mode: str = "off") -> UNet2DConditionModel:
        return UNet2DConditionModel(config=self.unet_config, tome=tome,
                                    dtype=self.dtype, use_pallas=use_pallas,
                                    resnet_mode=resnet_mode,
                                    resnet_quant=resnet_quant,
                                    sublayer_mode=sublayer_mode)

    def make_vae(self) -> AutoencoderKL:
        chans, layers = self.vae_channels
        return AutoencoderKL(block_out_channels=chans,
                             layers_per_block=layers,
                             scaling_factor=self.vae_scaling,
                             dtype=self.dtype)

    def make_text_model_2(self) -> CLIPTextModel:
        assert self.text2_config is not None
        return CLIPTextModel(cfg=self.text2_config, dtype=jnp.float32)

    def make_text_model(self) -> CLIPTextModel:
        return CLIPTextModel(cfg=self.text_config, dtype=jnp.float32)

    def make_controlnet(self, tome: Optional[ToMeConfig] = None,
                        use_pallas: Optional[bool] = None) -> ControlNetModel:
        assert self.controlnet_params is not None, "no ControlNet loaded"
        return ControlNetModel(config=self.controlnet_config, tome=tome,
                               dtype=self.dtype, use_pallas=use_pallas)


def _cast(tree, dtype):
    # One jitted dispatch for the whole tree: per-leaf eager casts are
    # hundreds of round trips on remote/tunneled backends.
    return jax.jit(
        lambda t: jax.tree.map(lambda a: a.astype(dtype), t))(tree)


def _jit_init(model, *args, seed: int = 0, **kwargs):
    """Run flax init under jit — un-jitted init dispatches thousands of tiny
    eager ops, which is pathologically slow on remote/tunneled backends."""
    init = jax.jit(lambda key: model.init(key, *args, **kwargs)["params"])
    return init(jax.random.key(seed))


def _random_unet_params(cfg: UNetConfig, dtype, seed: int = 0):
    model = UNet2DConditionModel(config=cfg, dtype=dtype)
    x = jnp.zeros((1, 8, 8, cfg.in_channels), dtype)
    ctx = jnp.zeros((1, 8, cfg.cross_attention_dim), dtype)
    return _jit_init(model, x, jnp.asarray(0), ctx, seed=seed)


def _random_vae_params(dtype, vae_channels=VAE_CHANNELS["default"],
                       seed: int = 1):
    chans, layers = vae_channels
    model = AutoencoderKL(block_out_channels=chans, layers_per_block=layers,
                          dtype=dtype)
    return _jit_init(model, jnp.zeros((1, 64, 64, 3), dtype), seed=seed)


def _random_text_params(cfg: CLIPTextConfig, seed: int = 2):
    model = CLIPTextModel(cfg=cfg)
    return _jit_init(model, jnp.zeros((1, cfg.max_positions), jnp.int32),
                     seed=seed)


def init_model(
    sd_version: str = "1.5",
    model_key: Optional[str] = None,
    control: str = "none",
    weight_dtype: str = "bf16",
    controlnet_root: Optional[str] = None,
    allow_random_weights: bool = True,
) -> ModelBundle:
    """Build the SD stack (reference utils/utils.py:19-67).

    ``model_key``: local checkpoint dir (standard SD layout).  If None or
    missing, random weights are used (warned)."""
    dtype = jnp.bfloat16 if weight_dtype in ("bf16", "fp16") else jnp.float32
    if sd_version not in SD_CONFIGS:
        # With a custom model_key the sd_version still selects the
        # architecture — fail loudly instead of silently assuming SD1.5.
        raise ValueError(
            f"Stable-diffusion version {sd_version!r} not supported "
            f"(choices: {sorted(SD_CONFIGS)}); with a custom model_key, "
            "pass the sd_version matching the checkpoint architecture.")
    text2_cfg = None
    vae_scaling = 0.18215
    if sd_version == "tiny":
        from vidtome_tpu.models.clip_text import TINY_TEXT
        from vidtome_tpu.models.unet import TINY_UNET

        unet_cfg, text_cfg = TINY_UNET, TINY_TEXT
        vae_channels = VAE_CHANNELS["tiny"]
    elif sd_version == "xl":
        from vidtome_tpu.models.clip_text import SDXL_TEXT_1, SDXL_TEXT_2
        from vidtome_tpu.models.unet import SDXL_UNET

        unet_cfg, text_cfg, text2_cfg = SDXL_UNET, SDXL_TEXT_1, SDXL_TEXT_2
        vae_channels = VAE_CHANNELS["default"]
        vae_scaling = 0.13025
    elif sd_version == "xl-refiner":
        from vidtome_tpu.models.clip_text import SDXL_TEXT_2
        from vidtome_tpu.models.unet import SDXL_REFINER_UNET

        # single (bigG) encoder IS the primary text model for the refiner
        unet_cfg, text_cfg = SDXL_REFINER_UNET, SDXL_TEXT_2
        vae_channels = VAE_CHANNELS["default"]
        vae_scaling = 0.13025
    elif sd_version == "tiny-refiner":
        from vidtome_tpu.models.clip_text import TINY_TEXT_2
        from vidtome_tpu.models.unet import TINY_REFINER_UNET

        unet_cfg, text_cfg = TINY_REFINER_UNET, TINY_TEXT_2
        vae_channels = VAE_CHANNELS["tiny"]
    else:
        unet_cfg, text_cfg = SD_CONFIGS.get(sd_version, SD_CONFIGS["1.5"])
        vae_channels = VAE_CHANNELS["default"]

    name = model_key or SD_MODEL_KEYS.get(sd_version, f"sd-{sd_version}")
    have_weights = model_key is not None and os.path.isdir(model_key)

    text2_params = None
    if have_weights:
        print(f"[INFO] loading stable diffusion from: {model_key}")
        unet_params = convert.convert_unet(
            convert.load_component_state(model_key, "unet"))
        vae_params = convert.convert_vae(
            convert.load_component_state(model_key, "vae"))
        # refiner checkpoints ship only the bigG encoder as text_encoder_2
        text_component = ("text_encoder_2"
                          if sd_version.endswith("refiner")
                          else "text_encoder")
        text_params = convert.convert_text_encoder(
            convert.load_component_state(model_key, text_component))
        unet_params = _cast(unet_params, dtype)
        vae_params = _cast(vae_params, dtype)
        text_params = _cast(text_params, jnp.float32)
        if text2_cfg is not None:
            text2_params = _cast(convert.convert_text_encoder(
                convert.load_component_state(model_key, "text_encoder_2")),
                jnp.float32)
    else:
        if not allow_random_weights:
            raise FileNotFoundError(
                f"checkpoint dir not found: {model_key!r}")
        print(f"[WARNING] no local checkpoint for {name!r} — initializing "
              "RANDOM weights (weight-free mode: development/benchmark only)")
        # flax init leaves params at param_dtype=float32 regardless of the
        # compute dtype — cast to the serving dtype like the checkpoint
        # path does, or every forward pays double weight bandwidth (~3.4GB
        # vs 1.7GB per SD1.5 UNet call).
        unet_params = _cast(_random_unet_params(unet_cfg, dtype), dtype)
        vae_params = _cast(_random_vae_params(dtype, vae_channels), dtype)
        text_params = _random_text_params(text_cfg)
        if text2_cfg is not None:
            text2_params = _random_text_params(text2_cfg, seed=4)

    tokenizer = load_tokenizer(model_key if have_weights else None,
                               vocab_size=text_cfg.vocab_size,
                               max_length=text_cfg.max_positions)

    bundle = ModelBundle(
        model_key=name, sd_version=sd_version, unet_config=unet_cfg,
        text_config=text_cfg, unet_params=unet_params,
        vae_params=vae_params, text_params=text_params, tokenizer=tokenizer,
        dtype=dtype, random_weights=not have_weights,
        vae_channels=vae_channels, vae_scaling=vae_scaling,
        text2_config=text2_cfg, text2_params=text2_params)

    if control not in ("none", "pnp"):
        assert control in CONTROLNET_DICT, f"unknown control type {control}"
        # all reference ControlNets are SD1.5-based; the weight-free tiny
        # stack gets a matching tiny ControlNet (its 768-dim cross
        # attention would reject the tiny text encoder's context)
        cn_cfg = unet_cfg if sd_version == "tiny" else SD15_UNET
        cn_dir = (os.path.join(controlnet_root, CONTROLNET_DICT[control])
                  if controlnet_root else None)
        if cn_dir and os.path.isdir(cn_dir):
            print(f"[INFO] loading controlnet from: {cn_dir}")
            state = convert.load_component_state(cn_dir, ".")
            bundle.controlnet_params = _cast(
                convert.convert_controlnet(state), dtype)
        else:
            print("[WARNING] ControlNet weights not found — random init")
            model = ControlNetModel(config=cn_cfg, dtype=dtype)
            x = jnp.zeros((1, 8, 8, cn_cfg.in_channels), dtype)
            ctx = jnp.zeros((1, 8, cn_cfg.cross_attention_dim), dtype)
            cond = jnp.zeros((1, 64, 64, 3), dtype)
            bundle.controlnet_params = _cast(
                _jit_init(model, x, jnp.asarray(0), ctx, cond, seed=3),
                dtype)
        bundle.controlnet_config = cn_cfg
    return bundle
