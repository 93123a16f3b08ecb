"""vidtome-tpu: TPU-native zero-shot video editing via cross-frame token merging.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of VidToMe
(lixirui142/VidToMe, CVPR 2024): DDIM-invert a source clip with a Stable
Diffusion model, then re-denoise it under an edit prompt while merging
temporally-redundant self-attention tokens across frames (local intra-chunk
merging + global inter-chunk merging against a rolling token bank), with
Plug-and-Play injection, ControlNet / depth conditioning and LoRA.

Unlike the reference (which monkey-patches HuggingFace diffusers modules,
`/root/reference/vidtome/patch.py:234-334`), this framework owns its UNet /
VAE / CLIP stack in Flax, expresses token merging as static-shape gather
plans (`vidtome_tpu.core.merge`), runs the chunked sampler as an explicit
loop carrying the global token bank as a pytree, and uses a Pallas flash
attention kernel for the merged self-attention hot path.
"""

__version__ = "0.1.0"

from vidtome_tpu.config import load_config, save_config  # noqa: F401


def __getattr__(name):
    # Lazy public API (keeps `import vidtome_tpu` light; jax/flax only load
    # when the model stack is actually used).
    if name == "init_model":
        from vidtome_tpu.models.registry import init_model

        return init_model
    if name == "Inverter":
        from vidtome_tpu.pipeline.inverter import Inverter

        return Inverter
    if name == "Generator":
        from vidtome_tpu.pipeline.generator import Generator

        return Generator
    if name == "seed_everything":
        from vidtome_tpu.utils import seed_everything

        return seed_everything
    raise AttributeError(name)
