"""Pipelines on a device mesh: invert + generate end-to-end with
dp x tp sharding on the 8-device virtual CPU mesh, results consistent with
the single-device run."""

import os

import jax
import numpy as np
import pytest

from tests.helpers import make_tiny_bundle, make_tiny_video
from tests.test_pipeline_e2e import _base_config
from vidtome_tpu.parallel.mesh import make_mesh, mesh_from_config

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_mesh_from_config():
    from vidtome_tpu.config import Config

    assert mesh_from_config(None) is None
    assert mesh_from_config(Config({"mesh": None})) is None
    mesh = mesh_from_config(Config({"mesh": {"data": 4, "model": 2}}))
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_pipeline_on_mesh_matches_single_device(tmp_path):
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.pipeline.inverter import Inverter

    bundle = make_tiny_bundle()
    video = make_tiny_video(str(tmp_path / "v"), n_frames=8, size=64)
    cfg = _base_config(str(tmp_path), video, merge_global=True)

    Inverter(bundle, cfg, use_pallas=False)(
        cfg.input_path, cfg.inversion.save_path)
    single = Generator(bundle, cfg, use_pallas=False)(
        cfg.input_path, cfg.generation.latents_path,
        os.path.join(str(tmp_path), "out_single"),
        frame_ids=list(range(8)))["edit"]

    mesh = make_mesh(data=4, model=2)
    meshed = Generator(bundle, cfg, use_pallas=False, mesh=mesh)(
        cfg.input_path, cfg.generation.latents_path,
        os.path.join(str(tmp_path), "out_mesh"),
        frame_ids=list(range(8)))["edit"]

    assert meshed.shape == single.shape
    assert np.isfinite(meshed).all()
    # merging decisions are discrete and can flip on reduction-order ulps,
    # so require close-but-not-bitwise agreement at the image level
    diff = np.abs(meshed - single).mean()
    assert diff < 0.02, f"mesh vs single mean |diff| {diff}"
