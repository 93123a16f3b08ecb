"""Eps-reuse step skipping (the third serving cache, DESIGN §9):
steps whose eps mask is False run NO UNet — the DDIM update reuses the
last computed guidance-combined eps, optionally linearly extrapolated
from the last two refresh steps.  No reference counterpart — the
training-free analog of TeaCache-style step skipping, quality-gated like
the deep-feature and CFG-delta caches.

Contracts tested here:
  * eps_interval=1 (refresh every step) is bit-identical to cache-off;
  * a skipped step's update equals ddim_step(x, cached_eps) exactly
    (eps recovered algebraically from the preceding run step);
  * linear extrapolation uses eps + factor*(eps - eps_prev) with the
    refresh-distance factor;
  * the eps-run mask auto-aligns over active deep/CFG refresh steps;
  * PnP + eps skip fails fast (skipped steps drop that timestep's
    injections).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_tiny_bundle, make_tiny_video
from tests.test_deepcache import _gen_config, _run_generation
from vidtome_tpu.core.scheduler import ddim_step


@pytest.fixture(scope="module")
def bundle():
    return make_tiny_bundle()


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    return make_tiny_video(str(tmp_path_factory.mktemp("video") / "frames"),
                           n_frames=8, size=64)


def _eps_from_update(x0, x1, a_t, a_prev):
    """Recover the eps a ddim_step used, from its input/output pair."""
    mu = np.sqrt(a_t)
    sigma = np.sqrt(1.0 - a_t)
    mu_p = np.sqrt(a_prev)
    sigma_p = np.sqrt(1.0 - a_prev)
    return (x1 - (mu_p / mu) * x0) / (sigma_p - mu_p * sigma / mu)


def _stepper(bundle, tmp_path, video_dir, n_steps, **gene_overrides):
    """Generator + manual one-step-at-a-time driver over the production
    sample_block executable (identity chunk schedule)."""
    from vidtome_tpu.pipeline.generator import Generator

    cfg = _gen_config(str(tmp_path), video_dir, n_timesteps=n_steps,
                      **gene_overrides)
    gen = Generator(bundle, cfg, use_pallas=False)
    gen.configure_frames(8)
    gen.depth = None
    gen.control_images = None
    ctx = gen.text.embed_cfg("a colorful gradient, oil painting", "blurry")
    latent_hw = 8
    x0 = jax.random.normal(jax.random.key(3),
                           (gen.n_padded, latent_hw, latent_hw, 4),
                           gen.bundle.dtype)
    n_chunks = gen.n_padded // gen.chunk_size
    fidx = jnp.arange(gen.n_padded, dtype=jnp.int32).reshape(
        n_chunks, gen.chunk_size)
    fidx_table = jnp.broadcast_to(
        jnp.stack([fidx, fidx], axis=-1),
        (n_steps, n_chunks, gen.chunk_size, 2))
    zero = jnp.zeros((), gen.bundle.dtype)
    gs = jnp.asarray(gen.guidance_scale, jnp.float32)
    caches = gen._cache_buffers(x0)
    modes = gen._mode_masks()

    xs = [np.asarray(x0, np.float32)]
    x = jnp.copy(x0)
    for s in range(n_steps):
        x, caches = gen._sample_block(
            gen._params, x, caches, jnp.asarray(s, jnp.int32), modes,
            fidx_table, ctx, zero, zero, zero, gs, n_steps=1)
        xs.append(np.asarray(x, np.float32))
    return gen, xs


class TestGeneratorEpsCache:
    @pytest.mark.slow
    def test_interval1_matches_off(self, bundle, video_dir, tmp_path):
        frames_off = _run_generation(bundle, tmp_path / "a", video_dir)
        frames_e1 = _run_generation(bundle, tmp_path / "b", video_dir,
                                    eps_interval=1)
        np.testing.assert_array_equal(frames_off, frames_e1)

    @pytest.mark.slow
    def test_skip_runs_and_is_close(self, bundle, video_dir, tmp_path):
        frames_off = _run_generation(bundle, tmp_path / "a", video_dir)
        frames_skip = _run_generation(bundle, tmp_path / "b", video_dir,
                                      eps_schedule="full:2,uniform:2")
        assert frames_skip.shape == frames_off.shape
        assert np.isfinite(frames_skip).all()
        diff = frames_off.astype(np.float32) - frames_skip.astype(np.float32)
        assert np.sqrt((diff ** 2).mean()) < 80.0

    @pytest.mark.slow
    def test_skip_step_reuses_cached_eps(self, bundle, video_dir, tmp_path):
        """Step 1 is skipped: its update must be exactly
        ddim_step(x1, eps0) where eps0 is the eps step 0 computed."""
        gen, xs = _stepper(bundle, tmp_path, video_dir, n_steps=3,
                           eps_schedule="full:1,shallow:1,uniform:1")
        a0 = [float(a) for a in gen.scheduler.sample_alpha_pair(0)]
        a1 = [float(a) for a in gen.scheduler.sample_alpha_pair(1)]
        eps0 = _eps_from_update(xs[0], xs[1], *a0)
        pred = np.asarray(ddim_step(
            jnp.asarray(xs[1]), jnp.asarray(eps0), a1[0], a1[1]))
        np.testing.assert_allclose(xs[2], pred, rtol=5e-3, atol=5e-3)

    @pytest.mark.slow
    def test_skip_step_extrapolates(self, bundle, video_dir, tmp_path):
        """Refreshes at steps 0,1 then a skip at step 2 with
        eps_extrapolate: eps_hat = 2*eps1 - eps0 (factor = 1)."""
        gen, xs = _stepper(bundle, tmp_path, video_dir, n_steps=4,
                           eps_schedule="full:2,shallow:1,uniform:1",
                           eps_extrapolate=True)
        a0 = [float(a) for a in gen.scheduler.sample_alpha_pair(0)]
        a1 = [float(a) for a in gen.scheduler.sample_alpha_pair(1)]
        a2 = [float(a) for a in gen.scheduler.sample_alpha_pair(2)]
        eps0 = _eps_from_update(xs[0], xs[1], *a0)
        eps1 = _eps_from_update(xs[1], xs[2], *a1)
        pred = np.asarray(ddim_step(
            jnp.asarray(xs[2]), jnp.asarray(2.0 * eps1 - eps0),
            a2[0], a2[1]))
        np.testing.assert_allclose(xs[3], pred, rtol=5e-3, atol=5e-3)

    @pytest.mark.slow
    def test_extrapolate_pipeline_runs(self, bundle, video_dir, tmp_path):
        frames = _run_generation(bundle, tmp_path / "a", video_dir,
                                 eps_schedule="full:2,uniform:2",
                                 eps_extrapolate=True)
        assert np.isfinite(frames).all()

    def test_skip_step_quadratic(self, bundle, video_dir, tmp_path):
        """Refreshes at steps 0,1,2 then a skip at step 3 with
        eps_extrapolate=2: Newton-form quadratic through three equally
        spaced nodes extrapolates eps_hat = 3*eps2 - 3*eps1 + eps0."""
        gen, xs = _stepper(bundle, tmp_path, video_dir, n_steps=5,
                           eps_schedule="full:3,shallow:1,uniform:1",
                           eps_extrapolate=2)
        alphas = [[float(a) for a in gen.scheduler.sample_alpha_pair(i)]
                  for i in range(4)]
        eps = [_eps_from_update(xs[i], xs[i + 1], *alphas[i])
               for i in range(3)]
        pred = np.asarray(ddim_step(
            jnp.asarray(xs[3]),
            jnp.asarray(3.0 * eps[2] - 3.0 * eps[1] + eps[0]),
            alphas[3][0], alphas[3][1]))
        np.testing.assert_allclose(xs[4], pred, rtol=5e-3, atol=5e-3)

    def test_quadratic_with_two_refreshes_is_linear(self, bundle,
                                                    video_dir, tmp_path):
        """Order 2 with only two distinct refreshes in history must NOT
        fake curvature from the aliased prev2 slot: the step-2 skip
        equals the linear prediction 2*eps1 - eps0."""
        gen, xs = _stepper(bundle, tmp_path, video_dir, n_steps=4,
                           eps_schedule="full:2,shallow:1,uniform:1",
                           eps_extrapolate=2)
        a = [[float(v) for v in gen.scheduler.sample_alpha_pair(i)]
             for i in range(3)]
        eps0 = _eps_from_update(xs[0], xs[1], *a[0])
        eps1 = _eps_from_update(xs[1], xs[2], *a[1])
        pred = np.asarray(ddim_step(
            jnp.asarray(xs[2]), jnp.asarray(2.0 * eps1 - eps0),
            a[2][0], a[2][1]))
        np.testing.assert_allclose(xs[3], pred, rtol=5e-3, atol=5e-3)

    @pytest.mark.slow
    def test_composes_with_deep_and_cfg_caches(self, bundle, video_dir,
                                               tmp_path):
        frames = _run_generation(bundle, tmp_path / "a", video_dir,
                                 cache_schedule="full:1,uniform:2",
                                 cfg_schedule="full:1,uniform:2",
                                 eps_schedule="full:1,uniform:2")
        assert np.isfinite(frames).all()


class TestEpsModeMasks:
    def test_eps_mask_aligns_over_active_caches(self, bundle, tmp_path):
        from vidtome_tpu.pipeline.generator import Generator

        cfg = _gen_config(str(tmp_path), "unused", n_timesteps=12,
                          cache_interval=3, eps_interval=2)
        gen = Generator(bundle, cfg, use_pallas=False)
        tab = np.asarray(gen._mode_masks())
        assert tab.shape == (12, 3)
        deep, epsm = tab[:, 0].astype(bool), tab[:, 2].astype(bool)
        assert not (deep & ~epsm).any()      # aligned after repair
        assert deep.sum() == 4               # deep schedule untouched
        assert epsm.sum() > 6                # eps gained the deep steps

    def test_eps_only_mask(self, bundle, tmp_path):
        from vidtome_tpu.pipeline.generator import Generator

        cfg = _gen_config(str(tmp_path), "unused", n_timesteps=8,
                          eps_interval=2)
        gen = Generator(bundle, cfg, use_pallas=False)
        tab = np.asarray(gen._mode_masks())
        assert tab.shape == (8, 3)
        assert list(np.where(tab[:, 2])[0]) == [0, 2, 4, 6]


class TestInverterEps:
    def _invert(self, bundle, tmp_path, video_dir, **inv_overrides):
        from vidtome_tpu.pipeline.inverter import Inverter
        import glob

        cfg = _gen_config(str(tmp_path), video_dir)
        cfg["inversion"].update(inv_overrides)
        inv = Inverter(bundle, cfg, use_pallas=False)
        inv(cfg.input_path, cfg.inversion.save_path)
        files = sorted(glob.glob(
            os.path.join(cfg.inversion.save_path, "**", "*.npy"),
            recursive=True))
        assert files
        return np.load(files[-1])

    def test_interval1_matches_off(self, bundle, video_dir, tmp_path):
        a = self._invert(bundle, tmp_path / "a", video_dir)
        b = self._invert(bundle, tmp_path / "b", video_dir, eps_interval=1)
        np.testing.assert_array_equal(a, b)

    def test_skip_runs(self, bundle, video_dir, tmp_path):
        a = self._invert(bundle, tmp_path / "a", video_dir)
        b = self._invert(bundle, tmp_path / "b", video_dir,
                         eps_schedule="full:2,uniform:2")
        assert b.shape == a.shape
        assert np.isfinite(b).all()

    def test_extrapolate_runs(self, bundle, video_dir, tmp_path):
        b = self._invert(bundle, tmp_path / "b", video_dir,
                         eps_schedule="full:2,uniform:2",
                         eps_extrapolate=True)
        assert np.isfinite(b).all()

    def test_quadratic_extrapolate_runs(self, bundle, video_dir, tmp_path):
        b = self._invert(bundle, tmp_path / "b", video_dir,
                         eps_schedule="full:3,uniform:2",
                         eps_extrapolate=2)
        assert np.isfinite(b).all()

    def test_aligns_with_deep_cache(self, bundle, video_dir, tmp_path,
                                    capsys):
        """Deep refreshes on eps-skip steps force those steps to run."""
        b = self._invert(bundle, tmp_path / "b", video_dir,
                         cache_schedule="full:1,uniform:2",
                         eps_schedule="full:2,uniform:2")
        assert np.isfinite(b).all()
        assert "auto-aligned" in capsys.readouterr().out


def test_extrap_weights_orders():
    """Host-side weights mirror the in-graph predictor: order reduction
    on short/aliased history, exact Lagrange at full history."""
    from vidtome_tpu.pipeline.generator import extrap_weights

    assert extrap_weights(5, 4, -1, -1, 2) == (1.0, 0.0, 0.0)
    assert extrap_weights(5, 4, 4, 4, 2) == (1.0, 0.0, 0.0)
    # two distinct nodes: linear (t=6 from s2=4, s1=2 -> f=1)
    np.testing.assert_allclose(extrap_weights(6, 4, 2, 2, 2),
                               (2.0, -1.0, 0.0))
    # order 1 ignores a full history
    np.testing.assert_allclose(extrap_weights(3, 2, 1, 0, 1),
                               (2.0, -1.0, 0.0))
    # three equally spaced nodes at t = s2 + 1: (3, -3, 1)
    np.testing.assert_allclose(extrap_weights(3, 2, 1, 0, 2),
                               (3.0, -3.0, 1.0))
    # weights always sum to 1 (affine invariance)
    for t, s2, s1, s0 in ((7, 5, 3, 2), (10, 6, 5, 1)):
        np.testing.assert_allclose(
            sum(extrap_weights(t, s2, s1, s0, 2)), 1.0, atol=1e-12)


def test_refresh_mask_every_segment():
    """every:NxK runs an every-Nth cadence for a bounded span, then hands
    off to the next segment (piecewise schedules like w3-then-w4)."""
    from vidtome_tpu.pipeline.generator import refresh_mask

    m = refresh_mask("full:2,every:2x4,uniform:3", 1, 12)
    assert list(np.where(m)[0]) == [0, 1, 2, 4, 6, 9]
    # every as the only windowed segment, remainder defaults to refresh
    m2 = refresh_mask("full:1,every:3x6", 1, 10)
    assert list(np.where(m2)[0]) == [0, 1, 4, 7, 8, 9]
    with pytest.raises(ValueError, match="NxK"):
        refresh_mask("full:1,every:3", 1, 10)
    with pytest.raises(ValueError, match=">= 1"):
        refresh_mask("every:0x4", 1, 10)


def test_eps_extrapolate_validation(bundle, tmp_path):
    from vidtome_tpu.pipeline.generator import Generator

    cfg = _gen_config(str(tmp_path), "unused", eps_interval=2,
                      eps_extrapolate=3)
    with pytest.raises(ValueError, match="eps_extrapolate"):
        Generator(bundle, cfg, use_pallas=False)


def test_pnp_rejects_eps_cache(bundle, tmp_path):
    """Skipped steps run no UNet, dropping that timestep's PnP
    injections — the combination fails fast at construction."""
    from vidtome_tpu.pipeline.generator import Generator

    cfg = _gen_config(str(tmp_path), "unused", control="pnp",
                      eps_interval=2)
    with pytest.raises(ValueError, match="pnp"):
        Generator(bundle, cfg, use_pallas=False)
