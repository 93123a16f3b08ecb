"""Batched-chunk step (generation.chunk_batch).

With token merging disabled the batched path is a pure batching
transform — chunks 2..K of a timestep run as one UNet call whose rows
are exactly the sequential calls' rows — so its output must MATCH the
sequential scan.  With merging on, the semantics deviate (star-topology
global merging, one shared matching draw); those deviations are covered
by the TPU quality gate (gates/chunk_batch*.json), and here we only pin
that the path runs, is deterministic, and is shape-correct.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from tests import helpers
from vidtome_tpu.config import Config


@pytest.fixture(scope="module")
def bundle():
    return helpers.make_tiny_bundle()


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    return helpers.make_tiny_video(
        str(tmp_path_factory.mktemp("vid")), n_frames=8)


def _gen_config(tmp_path, video_dir, **gene_overrides):
    gene = {
        "control": "none",
        "guidance_scale": 7.5,
        "n_timesteps": 4,
        "negative_prompt": "blurry",
        "prompt": {"edit": "a colorful gradient, oil painting"},
        "latents_path": os.path.join(tmp_path, "latents"),
        "output_path": os.path.join(tmp_path, "out"),
        "chunk_size": 4,
        "chunk_ord": "mix-4",
        "local_merge_ratio": 0.9,
        "merge_global": True,
        "global_merge_ratio": 0.8,
        "align_batch": False,
    }
    gene.update(gene_overrides)
    return Config({
        "sd_version": "1.5",
        "input_path": video_dir,
        "work_dir": str(tmp_path),
        "height": 64,
        "width": 64,
        "seed": 123,
        "float_precision": "fp32",
        "inversion": {
            "save_path": os.path.join(tmp_path, "latents"),
            "prompt": "a colorful gradient",
            "steps": 4,
            "save_steps": 4,
            "save_intermediate": False,
            "batch_size": 4,
            "n_frames": None,
            "force": False,
            "recon": False,
            "control": "none",
            "control_scale": 1.0,
        },
        "generation": gene,
    })


def _run_generation(bundle, tmp_path, video_dir, **gene_overrides):
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.pipeline.inverter import Inverter

    cfg = _gen_config(str(tmp_path), video_dir, **gene_overrides)
    inv = Inverter(bundle, cfg, use_pallas=False)
    inv(cfg.input_path, cfg.inversion.save_path)
    gen = Generator(bundle, cfg, use_pallas=False)
    out = gen(cfg.input_path, cfg.generation.latents_path,
              cfg.generation.output_path, list(range(8)))
    return out["edit"]


@pytest.mark.slow
def test_no_merge_batched_matches_sequential(bundle, video_dir, tmp_path):
    # merging fully off -> batching is semantics-free; rows of the one
    # batched call are exactly the sequential calls' rows
    base = dict(local_merge_ratio=0.0, merge_global=False)
    seq = _run_generation(bundle, tmp_path / "a", video_dir, **base)
    bat = _run_generation(bundle, tmp_path / "b", video_dir,
                          chunk_batch=True, **base)
    np.testing.assert_allclose(bat.astype(np.float32),
                               seq.astype(np.float32), atol=1.0)


@pytest.mark.slow
def test_merged_batched_runs_and_is_close(bundle, video_dir, tmp_path):
    seq = _run_generation(bundle, tmp_path / "a", video_dir)
    bat = _run_generation(bundle, tmp_path / "b", video_dir,
                          chunk_batch=True)
    assert bat.shape == seq.shape
    assert np.isfinite(bat.astype(np.float32)).all()
    # star-topology global merging deviates from the chain but must stay
    # correlated with it (uint8 frames; the real bar is the TPU gate)
    diff = seq.astype(np.float32) - bat.astype(np.float32)
    assert np.sqrt((diff ** 2).mean()) < 80.0


@pytest.mark.slow
def test_batched_is_deterministic(bundle, video_dir, tmp_path):
    a = _run_generation(bundle, tmp_path / "a", video_dir, chunk_batch=True)
    b = _run_generation(bundle, tmp_path / "b", video_dir, chunk_batch=True)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_chunk_batch_with_serving_caches_runs(bundle, video_dir, tmp_path):
    # the serve-profile combination: deep + cfg + eps caches on top of the
    # batched step (4 steps -> full:1,uniform:2 exercises every lane)
    out = _run_generation(
        bundle, tmp_path / "a", video_dir, chunk_batch=True,
        cache_schedule="full:1,uniform:2", cfg_schedule="full:1,uniform:2",
        eps_schedule="full:1,uniform:2", eps_extrapolate=True)
    assert np.isfinite(out.astype(np.float32)).all()


def test_chunk_batch_rejects_ragged(bundle, tmp_path):
    from vidtome_tpu.pipeline.generator import Generator

    cfg = _gen_config(str(tmp_path), str(tmp_path), chunk_batch=True,
                      chunk_boundaries="ragged")
    with pytest.raises(ValueError, match="chunk_batch"):
        Generator(bundle, cfg, use_pallas=False)
