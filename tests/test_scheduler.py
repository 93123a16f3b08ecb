"""DDIM scheduler: golden checks vs the closed forms in the reference
(invert.py:181-211) and invert->sample inverse-consistency."""

import jax.numpy as jnp
import numpy as np

from vidtome_tpu.core.scheduler import (DDIMScheduler, ddim_inverse_step,
                                        ddim_step)


def test_timestep_grid_matches_sd_convention():
    sch = DDIMScheduler.create(50)
    # leading spacing, offset 1: 981, 961, ..., 1
    assert sch.timesteps[0] == 981
    assert sch.timesteps[-1] == 1
    assert len(sch.timesteps) == 50
    assert np.all(np.diff(sch.timesteps) == -20)


def test_alphas_cumprod_scaled_linear():
    sch = DDIMScheduler.create(50)
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    expected = np.cumprod(1 - betas)
    np.testing.assert_allclose(sch.alphas_cumprod, expected, rtol=1e-5)
    # set_alpha_to_one=False -> final alpha is alphas_cumprod[0]
    np.testing.assert_allclose(sch.final_alpha_cumprod, expected[0], rtol=1e-6)


def test_step_is_exact_with_true_eps():
    """If eps is the exact noise, DDIM recovers the exact x0 at every step."""
    sch = DDIMScheduler.create(10)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    for i in range(sch.num_steps):
        a_t, a_prev = sch.sample_alpha_pair(i)
        x_t = np.sqrt(a_t) * x0 + np.sqrt(1 - a_t) * eps
        x_next = ddim_step(jnp.asarray(x_t), jnp.asarray(eps), a_t, a_prev)
        expected = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
        np.testing.assert_allclose(np.asarray(x_next), expected,
                                   rtol=1e-4, atol=1e-5)


def test_inversion_then_sampling_is_identity_with_fixed_eps():
    """With a constant eps model, inversion and sampling are exact inverses
    (the reference relies on this for reconstruction, invert.py:272-280)."""
    sch = DDIMScheduler.create(25)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((1, 4, 8, 8)).astype(np.float32))

    lat = x
    for i in range(sch.num_steps):
        a_t, a_prev = sch.inversion_alpha_pair(i)
        lat = ddim_inverse_step(lat, eps, a_t, a_prev)
    for i in range(sch.num_steps):
        a_t, a_prev = sch.sample_alpha_pair(i)
        lat = ddim_step(lat, eps, a_t, a_prev)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(x),
                               rtol=1e-3, atol=1e-4)


def test_inversion_alpha_pairs_mirror_sampling():
    """inversion step i uses the same alpha pair as sampling step S-1-i."""
    sch = DDIMScheduler.create(20)
    for i in range(sch.num_steps):
        inv_t, inv_prev = sch.inversion_alpha_pair(i)
        s_t, s_prev = sch.sample_alpha_pair(sch.num_steps - 1 - i)
        np.testing.assert_allclose(float(inv_t), float(s_t))
        np.testing.assert_allclose(float(inv_prev), float(s_prev))
