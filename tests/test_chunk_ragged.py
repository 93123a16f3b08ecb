"""Ragged chunk boundaries (reference generate.py:172-203 semantics under
static shapes) — schedule-level invariants + pipeline smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidtome_tpu.core.chunk import (build_fidx_table, fidx_pair,
                                    pad_to_chunks, ragged_fidx)


class TestRaggedFidx:
    def test_scatter_covers_each_frame_once(self):
        rng = np.random.default_rng(0)
        for n, cs in ((32, 4), (30, 4), (29, 4), (7, 3), (4, 4)):
            for _ in range(20):
                out = ragged_fidx(n, cs, rng, chunk_ord="mix",
                                  waste_slot=n)
                scatter = out[..., 1].ravel()
                real = scatter[scatter < n]
                # every real frame written exactly once; dups -> waste
                assert sorted(real.tolist()) == list(range(n)), (n, cs)
                assert (scatter[scatter >= n] == n).all()

    def test_gather_only_real_frames(self):
        rng = np.random.default_rng(1)
        for _ in range(20):
            out = ragged_fidx(30, 4, rng, waste_slot=30)
            assert out[..., 0].max() < 30  # pads never gathered

    def test_constant_chunk_count(self):
        rng = np.random.default_rng(2)
        for n, cs in ((32, 4), (30, 4), (29, 4), (16, 8)):
            K = {ragged_fidx(n, cs, rng).shape[0] for _ in range(30)}
            assert len(K) == 1, (n, cs, K)
            assert K.pop() == 1 + int(np.ceil((n - 1) / cs))

    def test_dup_slots_gather_within_chunk(self):
        """Duplicate gather slots repeat a frame already in the chunk
        (identical tokens: attention-invariant, lossless to merge)."""
        rng = np.random.default_rng(3)
        for _ in range(20):
            out = ragged_fidx(30, 4, rng, waste_slot=30)
            for c in range(out.shape[0]):
                g, s = out[c, :, 0], out[c, :, 1]
                dup = g[s == 30]
                real = set(g[s < 30].tolist())
                assert all(int(d) in real for d in dup)

    def test_first_chunk_raggedness_varies(self):
        """The schedule must actually randomize the first-chunk length."""
        rng = np.random.default_rng(4)
        lengths = set()
        for _ in range(50):
            out = ragged_fidx(32, 4, rng, chunk_ord="seq")
            # chunks in seq order (possibly flipped); collect all chunk
            # real-lengths and note the short one
            for c in range(out.shape[0]):
                lengths.add(int((out[c, :, 1] < 32).sum()))
        assert len(lengths & {1, 2, 3}) >= 2  # several short lengths seen

    def test_build_fidx_table_rotate_pairs(self):
        rng = np.random.default_rng(5)
        tab = build_fidx_table(32, 4, rng, steps=5, chunk_ord="mix")
        assert tab.shape == (5, 8, 4, 2)
        np.testing.assert_array_equal(tab[..., 0], tab[..., 1])

    def test_fidx_pair(self):
        f = np.arange(8).reshape(2, 4)
        p = fidx_pair(f)
        assert p.shape == (2, 4, 2)
        np.testing.assert_array_equal(p[..., 0], p[..., 1])


class TestRaggedPipeline:
    @pytest.mark.slow
    def test_generation_ragged_mode_runs(self):
        """End-to-end tiny generation with chunk_boundaries: ragged —
        waste slots absorb dup writes, real-frame outputs stay finite and
        consistent in scale with rotate mode."""
        from tests.helpers import make_tiny_bundle
        from vidtome_tpu.config import Config
        from vidtome_tpu.pipeline.generator import Generator

        bundle = make_tiny_bundle()
        outs = {}
        for mode in ("rotate", "ragged"):
            gene = {
                "control": "none", "guidance_scale": 7.5,
                "n_timesteps": 4, "negative_prompt": "bad",
                "prompt": {"edit": "x"}, "latents_path": "/tmp/rg",
                "output_path": "/tmp/rg", "chunk_size": 4,
                "chunk_ord": "mix-4", "local_merge_ratio": 0.9,
                "merge_global": True, "global_merge_ratio": 0.8,
                "global_rand": 0.5, "align_batch": False,
                "save_frame": False, "chunk_boundaries": mode,
            }
            cfg = Config({"sd_version": "1.5", "height": 64, "width": 64,
                          "seed": 3, "work_dir": "/tmp/rg",
                          "float_precision": "fp32", "generation": gene})
            gen = Generator(bundle, cfg, use_pallas=False)
            gen.configure_frames(8)
            gen.depth = None
            gen.control_images = None
            if mode == "ragged":
                assert gen.n_padded == 12  # 8 frames + waste chunk
            init = jax.random.normal(jax.random.key(0), (8, 8, 8, 4),
                                     jnp.float32)
            ctx = gen.text.embed_cfg("x", "bad")
            clean = gen.ddim_sample(jnp.copy(init[gen.pad_src]), ctx)
            outs[mode] = np.asarray(gen.vae.decode(clean[:8]), np.float32)
            assert np.isfinite(outs[mode]).all()
        # different schedules -> different outputs, but same distribution
        # scale (a gross scale mismatch would mean clobbered real frames)
        ra, ro = outs["ragged"], outs["rotate"]
        assert 0.25 < (np.abs(ra).mean() / (np.abs(ro).mean() + 1e-9)) < 4.0

    @pytest.mark.slow
    def test_ragged_with_serving_caches(self):
        """ragged boundaries + deep-feature cache + CFG delta cache: the
        cache reads use the gather column and writes the scatter column
        (waste slot absorbs duplicates) — outputs must stay finite and
        the waste slots must never leak into real frames."""
        from tests.helpers import make_tiny_bundle
        from vidtome_tpu.config import Config
        from vidtome_tpu.pipeline.generator import Generator

        bundle = make_tiny_bundle()
        gene = {
            "control": "none", "guidance_scale": 7.5,
            "n_timesteps": 6, "negative_prompt": "bad",
            "prompt": {"edit": "x"}, "latents_path": "/tmp/rgc",
            "output_path": "/tmp/rgc", "chunk_size": 4,
            "chunk_ord": "mix-4", "local_merge_ratio": 0.9,
            "merge_global": True, "global_merge_ratio": 0.8,
            "global_rand": 0.5, "align_batch": False,
            "save_frame": False, "chunk_boundaries": "ragged",
            "cache_schedule": "full:2,uniform:2",
            "cfg_schedule": "full:2,uniform:2",
        }
        cfg = Config({"sd_version": "1.5", "height": 64, "width": 64,
                      "seed": 5, "work_dir": "/tmp/rgc",
                      "float_precision": "fp32", "generation": gene})
        gen = Generator(bundle, cfg, use_pallas=False)
        gen.configure_frames(8)
        gen.depth = None
        gen.control_images = None
        init = jax.random.normal(jax.random.key(2), (8, 8, 8, 4),
                                 jnp.float32)
        clean = gen.ddim_sample(jnp.copy(init[gen.pad_src]),
                                gen.text.embed_cfg("x", "bad"))
        out = np.asarray(gen.vae.decode(clean[:8]), np.float32)
        assert out.shape[0] == 8 and np.isfinite(out).all()
