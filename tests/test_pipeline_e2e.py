"""End-to-end pipeline integration tests with a tiny random-weight bundle:
invert -> cache latents -> generate (plain CFG, global merging, PnP),
exercising the reference workflow (SURVEY.md §3) on CPU."""

import os

import numpy as np
import pytest

from vidtome_tpu.config import Config
from tests.helpers import make_tiny_bundle, make_tiny_video

pytestmark = pytest.mark.slow


def _base_config(tmp_path, video_dir, **gene_overrides):
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
        "global_rand": 0.5,
        "align_batch": False,
        "save_frame": True,
        "pnp_attn_t": 0.5,
        "pnp_f_t": 0.8,
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
            "save_intermediate": True,
            "batch_size": 4,
            "n_frames": None,
            "force": False,
            "recon": False,
            "control": "none",
            "control_scale": 1.0,
        },
        "generation": gene,
    })


@pytest.fixture(scope="module")
def bundle():
    return make_tiny_bundle()


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    return make_tiny_video(str(tmp_path_factory.mktemp("video") / "frames"),
                           n_frames=6, size=64)


class TestEndToEnd:
    def test_invert_then_generate(self, bundle, video_dir, tmp_path):
        from vidtome_tpu.pipeline.generator import Generator
        from vidtome_tpu.pipeline.inverter import Inverter

        cfg = _base_config(str(tmp_path), video_dir)
        inv = Inverter(bundle, cfg, use_pallas=False)
        inv(cfg.input_path, cfg.inversion.save_path)

        lat_dir = os.path.join(cfg.inversion.save_path, "tiny-test-model")
        files = os.listdir(lat_dir)
        assert any(f.startswith("noisy_latents_") for f in files)
        assert "config.yaml" in files
        assert "inversion_prompts.txt" in files

        # idempotent skip (reference invert.py:244-246)
        inv2 = Inverter(bundle, cfg, use_pallas=False)
        assert inv2(cfg.input_path, cfg.inversion.save_path) is None

        gen = Generator(bundle, cfg, use_pallas=False)
        outputs = gen(cfg.input_path, cfg.generation.latents_path,
                      cfg.generation.output_path, frame_ids=list(range(6)))
        frames = outputs["edit"]
        assert frames.shape == (6, 64, 64, 3)
        assert np.isfinite(frames).all()
        assert frames.min() >= 0.0 and frames.max() <= 1.0
        out_dir = os.path.join(cfg.generation.output_path, "edit")
        assert os.path.exists(os.path.join(out_dir, "config.yaml"))
        assert os.path.exists(os.path.join(out_dir, "frames", "0000.png"))

    def test_generate_pnp(self, bundle, video_dir, tmp_path):
        from vidtome_tpu.pipeline.generator import Generator
        from vidtome_tpu.pipeline.inverter import Inverter

        cfg = _base_config(str(tmp_path), video_dir, control="pnp",
                           merge_global=False, align_batch=True)
        Inverter(bundle, cfg, use_pallas=False)(
            cfg.input_path, cfg.inversion.save_path)
        gen = Generator(bundle, cfg, use_pallas=False)
        assert gen.num_lanes == 3
        outputs = gen(cfg.input_path, cfg.generation.latents_path,
                      cfg.generation.output_path, frame_ids=list(range(6)))
        assert outputs["edit"].shape == (6, 64, 64, 3)
        assert np.isfinite(outputs["edit"]).all()

    def test_generate_multi_prompt(self, bundle, video_dir, tmp_path):
        from vidtome_tpu.pipeline.generator import Generator
        from vidtome_tpu.pipeline.inverter import Inverter

        cfg = _base_config(
            str(tmp_path), video_dir, merge_global=False,
            prompt={"a": "style one", "b": "style two"})
        Inverter(bundle, cfg, use_pallas=False)(
            cfg.input_path, cfg.inversion.save_path)
        outputs = Generator(bundle, cfg, use_pallas=False)(
            cfg.input_path, cfg.generation.latents_path,
            cfg.generation.output_path, frame_ids=list(range(6)))
        assert set(outputs) == {"a", "b"}
        # different prompts must produce different edits
        assert np.abs(outputs["a"] - outputs["b"]).max() > 1e-4

    def test_inversion_recon_path(self, bundle, video_dir, tmp_path):
        from vidtome_tpu.pipeline.inverter import Inverter

        cfg = _base_config(str(tmp_path), video_dir)
        cfg.inversion["recon"] = True
        cfg.inversion["force"] = True
        Inverter(bundle, cfg, use_pallas=False)(
            cfg.input_path, cfg.inversion.save_path)
        recon_dir = os.path.join(cfg.inversion.save_path, "tiny-test-model",
                                 "recon_frames")
        assert os.path.exists(os.path.join(recon_dir, "0000.png"))


class TestChunkScheduling:
    def test_rotation_covers_all_frames(self):
        from vidtome_tpu.core.chunk import chunk_schedule, pad_to_chunks

        rng = np.random.default_rng(0)
        n_padded, src = pad_to_chunks(6, 4)
        assert n_padded == 8
        np.testing.assert_array_equal(src[6:], [5, 5])
        for _ in range(10):
            sch = chunk_schedule(n_padded, 4, rng, chunk_ord="mix")
            seen = np.concatenate([sch.chunk_frames(i)
                                   for i in range(sch.n_chunks)])
            assert sorted(seen.tolist()) == list(range(8))

    def test_chunk_orders(self):
        from vidtome_tpu.core.chunk import chunk_schedule

        rng = np.random.default_rng(1)
        sch = chunk_schedule(32, 4, rng, chunk_ord="seq")
        np.testing.assert_array_equal(sch.chunk_perm, np.arange(8))
        sch = chunk_schedule(32, 4, rng, chunk_ord="rand")
        assert sorted(sch.chunk_perm.tolist()) == list(range(8))
        sch = chunk_schedule(32, 4, rng, chunk_ord="mix", perm_div=4.0)
        assert sorted(sch.chunk_perm.tolist()) == list(range(8))
        # no global merge -> order stays sequential
        sch = chunk_schedule(32, 4, rng, chunk_ord="rand", merge_global=False)
        np.testing.assert_array_equal(sch.chunk_perm, np.arange(8))
