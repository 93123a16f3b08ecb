"""Deep-feature caching (serving acceleration): the UNet's "full"/"shallow"
cache split and the Generator's ``cache_interval`` step schedule.

The split contract: a "shallow" call fed the deep feature from a "full"
call at the SAME timestep reproduces the full call's output exactly (the
shallow path runs identical ops for the parts it recomputes).  At
interval 1 every step is full, so the whole pipeline must match the
cache-off pipeline bit-for-bit.  No reference counterpart — this is a
quality-gated TPU-serving mode (DESIGN.md §9/§12)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_tiny_bundle, make_tiny_video
from vidtome_tpu.config import Config
from vidtome_tpu.models.tome import ToMeCall, ToMeConfig


@pytest.fixture(scope="module")
def bundle():
    return make_tiny_bundle()


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    return make_tiny_video(str(tmp_path_factory.mktemp("video") / "frames"),
                           n_frames=8, size=64)


class TestUNetSplit:
    def _unet_and_inputs(self, bundle, tome=None):
        unet = bundle.make_unet(tome=tome, use_pallas=False)
        B = 8  # 2 lanes x 4 frames
        x = jax.random.normal(jax.random.key(0), (B, 8, 8, 4), jnp.float32)
        ctx = jax.random.normal(jax.random.key(1),
                                (B, 16, bundle.text_config.hidden_size),
                                jnp.float32)
        t = jnp.asarray(3)
        return unet, {"params": bundle.unet_params}, x, t, ctx

    @pytest.mark.slow
    def test_shallow_matches_full_same_timestep(self, bundle):
        unet, params, x, t, ctx = self._unet_and_inputs(bundle)
        eps_full, deep = unet.apply(params, x, t, ctx, cache_mode="full")
        eps_off = unet.apply(params, x, t, ctx)
        np.testing.assert_array_equal(np.asarray(eps_full),
                                      np.asarray(eps_off))
        eps_shallow = unet.apply(params, x, t, ctx, cache_mode="shallow",
                                 deep_cache=deep)
        np.testing.assert_allclose(np.asarray(eps_shallow),
                                   np.asarray(eps_full), atol=1e-6)

    @pytest.mark.slow
    def test_shallow_matches_full_with_merging(self, bundle):
        tome = ToMeConfig(frames=4, local_merge_ratio=0.9, max_downsample=2,
                          len_quantum=None)
        unet, params, x, t, ctx = self._unet_and_inputs(bundle, tome=tome)
        call = ToMeCall(key=jax.random.key(7))
        eps_full, deep = unet.apply(params, x, t, ctx, tome_call=call,
                                    num_lanes=2, cache_mode="full")
        eps_shallow = unet.apply(params, x, t, ctx,
                                 tome_call=ToMeCall(key=jax.random.key(7)),
                                 num_lanes=2, cache_mode="shallow",
                                 deep_cache=deep)
        np.testing.assert_allclose(np.asarray(eps_shallow),
                                   np.asarray(eps_full), atol=1e-6)

    def test_deep_shape_is_level0_spatial_ch1(self, bundle):
        unet, params, x, t, ctx = self._unet_and_inputs(bundle)
        _, deep = unet.apply(params, x, t, ctx, cache_mode="full")
        ch = bundle.unet_config.block_out_channels[1]
        assert deep.shape == (x.shape[0], x.shape[1], x.shape[2], ch)


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


class TestGeneratorCacheInterval:
    @pytest.mark.slow
    def test_interval1_matches_off(self, bundle, video_dir, tmp_path):
        frames_off = _run_generation(bundle, tmp_path / "a", video_dir)
        frames_i1 = _run_generation(bundle, tmp_path / "b", video_dir,
                                    cache_interval=1)
        np.testing.assert_array_equal(frames_off, frames_i1)

    @pytest.mark.slow
    def test_interval2_runs_and_is_close(self, bundle, video_dir, tmp_path):
        frames_off = _run_generation(bundle, tmp_path / "a", video_dir)
        frames_i2 = _run_generation(bundle, tmp_path / "b", video_dir,
                                    cache_interval=2)
        assert frames_i2.shape == frames_off.shape
        assert np.isfinite(frames_i2).all()
        # shallow steps reuse stale deep features — outputs drift but must
        # stay correlated with the exact path (uint8 frames)
        diff = frames_off.astype(np.float32) - frames_i2.astype(np.float32)
        assert np.sqrt((diff ** 2).mean()) < 80.0


class TestInversionCache:
    """Deep-feature step cache on the inversion loop (inversion.
    cache_interval / cache_schedule — static per-step mode, no cond)."""

    def _invert(self, bundle, tmp_path, video_dir, **inv_overrides):
        from vidtome_tpu.pipeline.inverter import Inverter

        cfg = _gen_config(str(tmp_path), video_dir)
        cfg["inversion"].update(inv_overrides)
        inv = Inverter(bundle, cfg, use_pallas=False)
        inv(cfg.input_path, cfg.inversion.save_path)
        import glob

        files = sorted(glob.glob(
            os.path.join(cfg.inversion.save_path, "**", "*.npy"),
            recursive=True))
        assert files
        return np.load(files[-1])

    @pytest.mark.slow
    def test_interval1_matches_off(self, bundle, video_dir, tmp_path):
        a = self._invert(bundle, tmp_path / "a", video_dir)
        b = self._invert(bundle, tmp_path / "b", video_dir,
                         cache_interval=1)
        np.testing.assert_array_equal(a, b)

    @pytest.mark.slow
    def test_schedule_runs(self, bundle, video_dir, tmp_path):
        a = self._invert(bundle, tmp_path / "a", video_dir)
        b = self._invert(bundle, tmp_path / "b", video_dir,
                         cache_schedule="full:2,uniform:2")
        assert b.shape == a.shape
        assert np.isfinite(b).all()


def test_pnp_rejects_deep_cache(bundle, tmp_path):
    """Shallow steps skip the up-block-1 PnP injections, so the
    combination fails fast at construction (no gated profile exists)."""
    from vidtome_tpu.pipeline.generator import Generator

    cfg = _gen_config(str(tmp_path), "unused", control="pnp",
                      cache_interval=2)
    with pytest.raises(ValueError, match="pnp"):
        Generator(bundle, cfg, use_pallas=False)


class TestRefreshMask:
    def test_uniform_interval(self):
        from vidtome_tpu.pipeline.generator import refresh_mask
        m = refresh_mask(None, 3, 10)
        assert list(np.where(m)[0]) == [0, 3, 6, 9]

    def test_uniform_with_start(self):
        from vidtome_tpu.pipeline.generator import refresh_mask
        m = refresh_mask(None, 2, 10, start=5)
        assert list(np.where(m[5:])[0] + 5) == [5, 7, 9]
        assert m[:5].all()  # pre-start steps default to full

    def test_warmup_then_uniform(self):
        from vidtome_tpu.pipeline.generator import refresh_mask
        m = refresh_mask("full:4,uniform:3", 0, 12)
        assert list(np.where(m)[0]) == [0, 1, 2, 3, 4, 7, 10]

    def test_segments_without_uniform_refresh_tail(self):
        from vidtome_tpu.pipeline.generator import refresh_mask
        m = refresh_mask("full:2,shallow:3", 0, 8)
        assert list(m.astype(int)) == [1, 1, 0, 0, 0, 1, 1, 1]

    def test_first_step_must_refresh(self):
        from vidtome_tpu.pipeline.generator import refresh_mask
        with pytest.raises(ValueError):
            refresh_mask("shallow:2,uniform:2", 0, 8)

    def test_bad_segment_rejected(self):
        from vidtome_tpu.pipeline.generator import refresh_mask
        with pytest.raises(ValueError):
            refresh_mask("uniform:2,full:3", 0, 8)  # uniform not last
        with pytest.raises(ValueError):
            refresh_mask("bogus:2", 0, 8)


class TestCacheSchedule:
    @pytest.mark.slow
    def test_schedule_all_full_matches_off(self, bundle, video_dir,
                                           tmp_path):
        frames_off = _run_generation(bundle, tmp_path / "a", video_dir)
        frames_s = _run_generation(bundle, tmp_path / "b", video_dir,
                                   cache_schedule="uniform:1")
        np.testing.assert_array_equal(frames_off, frames_s)

    @pytest.mark.slow
    def test_warmup_schedule_runs(self, bundle, video_dir, tmp_path):
        frames = _run_generation(bundle, tmp_path / "a", video_dir,
                                 cache_schedule="full:2,uniform:2")
        assert np.isfinite(frames).all()


class TestCFGCache:
    @pytest.mark.slow
    def test_cfg_interval1_matches_off(self, bundle, video_dir, tmp_path):
        frames_off = _run_generation(bundle, tmp_path / "a", video_dir)
        frames_i1 = _run_generation(bundle, tmp_path / "b", video_dir,
                                    cfg_interval=1)
        np.testing.assert_array_equal(frames_off, frames_i1)

    @pytest.mark.slow
    def test_cfg_interval2_runs(self, bundle, video_dir, tmp_path):
        frames_off = _run_generation(bundle, tmp_path / "a", video_dir)
        frames_i2 = _run_generation(bundle, tmp_path / "b", video_dir,
                                    cfg_interval=2)
        assert frames_i2.shape == frames_off.shape
        assert np.isfinite(frames_i2).all()
        diff = frames_off.astype(np.float32) - frames_i2.astype(np.float32)
        assert np.sqrt((diff ** 2).mean()) < 80.0

    @pytest.mark.slow
    def test_combined_serve_profile_runs(self, bundle, video_dir, tmp_path):
        frames = _run_generation(bundle, tmp_path / "a", video_dir,
                                 cache_interval=2, cfg_interval=2)
        assert np.isfinite(frames).all()

    @pytest.mark.slow
    def test_combined_interval1_matches_off(self, bundle, video_dir,
                                            tmp_path):
        frames_off = _run_generation(bundle, tmp_path / "a", video_dir)
        frames_i1 = _run_generation(bundle, tmp_path / "b", video_dir,
                                    cache_interval=1, cfg_interval=1)
        np.testing.assert_array_equal(frames_off, frames_i1)


class TestScheduleAutoAlign:
    def test_misaligned_schedules_auto_align(self, bundle, video_dir,
                                             tmp_path):
        """Deep refreshes landing on CFG-skip steps leave the uncond
        lane's deep slice stale (serve32 measured 27 dB — below the
        gate), so _mode_masks force-aligns: every deep-refresh step also
        refreshes the CFG delta cache."""
        import numpy as np

        from vidtome_tpu.pipeline.generator import Generator

        cfg = _gen_config(str(tmp_path), video_dir, n_timesteps=12,
                          cache_interval=3, cfg_interval=2)
        gen = Generator(bundle, cfg, use_pallas=False)
        tab = np.asarray(gen._mode_masks())
        deep, cfgm = tab[:, 0].astype(bool), tab[:, 1].astype(bool)
        assert not (deep & ~cfgm).any()      # aligned after repair
        assert deep.sum() == 4               # deep schedule untouched
        assert cfgm.sum() > 6                # cfg gained the deep steps

    def test_aligned_schedules_untouched(self, bundle, video_dir,
                                         tmp_path):
        import numpy as np

        from vidtome_tpu.pipeline.generator import Generator

        cfg = _gen_config(str(tmp_path), video_dir, n_timesteps=12,
                          cache_interval=4, cfg_interval=2)
        gen = Generator(bundle, cfg, use_pallas=False)
        tab = np.asarray(gen._mode_masks())
        deep, cfgm = tab[:, 0].astype(bool), tab[:, 1].astype(bool)
        assert not (deep & ~cfgm).any()
        assert cfgm.sum() == 6               # exactly the cfg-2 pattern
