"""End-to-end conditioning paths: ControlNet (canny) and SD-depth, on tiny
stacks (the branches of Inverter/Generator not covered by the plain/PnP
e2e tests)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_tiny_bundle, make_tiny_video
from tests.test_pipeline_e2e import _base_config

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    return make_tiny_video(str(tmp_path_factory.mktemp("vid") / "frames"),
                           n_frames=6, size=64)


def _add_tiny_controlnet(bundle):
    from vidtome_tpu.models.controlnet import ControlNetModel
    from vidtome_tpu.models.registry import _jit_init
    from vidtome_tpu.models.unet import TINY_UNET

    model = ControlNetModel(config=TINY_UNET, dtype=bundle.dtype,
                            use_pallas=False)
    x = jnp.zeros((1, 8, 8, 4), bundle.dtype)
    ctx = jnp.zeros((1, 8, 32), bundle.dtype)
    cond = jnp.zeros((1, 64, 64, 3), bundle.dtype)
    params = _jit_init(model, x, jnp.asarray(0), ctx, cond, seed=7)

    # Real ControlNets train their zero-convs away from zero; at random
    # init they are exactly zero (correct but makes the net a no-op), so
    # perturb them for the conditioning-influence assertions.
    def perturb(tree, key):
        leaves, treedef = jax.tree.flatten(tree)
        keys = jax.random.split(key, len(leaves))
        return treedef.unflatten([
            leaf + 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
            for leaf, k in zip(leaves, keys)])

    for name in list(params):
        if name.startswith("zero_convs") or name == "mid_zero_conv":
            params[name] = perturb(params[name], jax.random.key(hash(name) % 2**31))
    bundle.controlnet_params = params
    bundle.controlnet_config = TINY_UNET
    return bundle


def test_controlnet_generation(video_dir, tmp_path):
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.pipeline.inverter import Inverter

    bundle = _add_tiny_controlnet(make_tiny_bundle())
    cfg = _base_config(str(tmp_path), video_dir, control="canny",
                       control_scale=0.7, merge_global=True)
    cfg.inversion["control"] = "canny"  # ControlNet during inversion too
    Inverter(bundle, cfg, use_pallas=False)(cfg.input_path,
                                            cfg.inversion.save_path)
    gen = Generator(bundle, cfg, use_pallas=False)
    assert gen.use_controlnet
    out = gen(cfg.input_path, cfg.generation.latents_path,
              cfg.generation.output_path, frame_ids=list(range(6)))
    frames = out["edit"]
    assert frames.shape == (6, 64, 64, 3)
    assert np.isfinite(frames).all()
    # control images cached to disk (reference layout)
    assert os.path.exists(os.path.join(str(tmp_path), "canny_image",
                                       "0000.png"))

    # control conditioning must actually influence the result
    cfg2 = _base_config(str(tmp_path), video_dir, control="canny",
                        control_scale=0.0, merge_global=True)
    out2 = Generator(bundle, cfg2, use_pallas=False)(
        cfg2.input_path, cfg2.generation.latents_path,
        os.path.join(str(tmp_path), "out0"), frame_ids=list(range(6)))
    assert np.abs(out2["edit"] - frames).max() > 1e-4


def test_depth_model_pipeline(video_dir, tmp_path):
    """sd_version='depth': 5-channel UNet input with depth latents."""
    import tests.helpers as helpers
    from vidtome_tpu.models.registry import ModelBundle, _jit_init
    from vidtome_tpu.models.unet import TINY_UNET, UNet2DConditionModel
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.pipeline.inverter import Inverter

    bundle = make_tiny_bundle()
    depth_cfg = dataclasses.replace(TINY_UNET, in_channels=5)
    unet = UNet2DConditionModel(config=depth_cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 5), jnp.float32)
    ctx = jnp.zeros((1, 16, 32), jnp.float32)
    bundle.unet_params = _jit_init(unet, x, jnp.asarray(0), ctx, seed=9)
    bundle.unet_config = depth_cfg
    bundle.sd_version = "depth"
    assert bundle.use_depth

    cfg = _base_config(str(tmp_path), video_dir, control="none",
                       merge_global=False)
    Inverter(bundle, cfg, use_pallas=False)(cfg.input_path,
                                            cfg.inversion.save_path)
    # depth maps cached
    assert os.path.exists(os.path.join(str(tmp_path), "depth", "0000.npy"))
    out = Generator(bundle, cfg, use_pallas=False)(
        cfg.input_path, cfg.generation.latents_path,
        cfg.generation.output_path, frame_ids=list(range(6)))
    assert out["edit"].shape == (6, 64, 64, 3)
    assert np.isfinite(out["edit"]).all()
