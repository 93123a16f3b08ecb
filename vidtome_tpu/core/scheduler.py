"""DDIM scheduler: closed-form deterministic sampling and inversion updates.

Re-derivation of the reference's DDIM math (``invert.py:181-211`` and
``generate.py:281-311`` in lixirui142/VidToMe, which itself mirrors the
Stable Diffusion DDIMScheduler: scaled-linear betas 8.5e-4 -> 1.2e-2 over
1000 train steps, ``steps_offset=1``, leading timestep spacing,
``set_alpha_to_one=False`` so the final alpha-bar is ``alphas_cumprod[0]``).

Everything here is pure jnp on precomputed tables, safe under ``jit`` and
``lax.scan``: the per-step alpha-bars are gathered from a table indexed by
the loop counter, never by data-dependent Python control flow.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    """Deterministic DDIM schedule over a subsampled timestep grid.

    Attributes:
      timesteps: [S] int32, descending (sampling order), e.g. [981, 961, ... 1].
      alphas_cumprod: [T] float32 over all train timesteps.
      final_alpha_cumprod: scalar used at the boundary step.
    """

    num_train_timesteps: int
    timesteps: np.ndarray
    alphas_cumprod: np.ndarray
    final_alpha_cumprod: float

    @staticmethod
    def create(
        num_inference_steps: int,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        steps_offset: int = 1,
        set_alpha_to_one: bool = False,
    ) -> "DDIMScheduler":
        if beta_schedule == "scaled_linear":
            betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                                num_train_timesteps, dtype=np.float64) ** 2
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                                dtype=np.float64)
        else:
            raise ValueError(f"unknown beta_schedule: {beta_schedule}")
        alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)

        # "leading" spacing: t_i = i * (T // S) + offset, descending.
        step_ratio = num_train_timesteps // num_inference_steps
        timesteps = (np.arange(num_inference_steps) * step_ratio).round()[::-1]
        timesteps = (timesteps + steps_offset).astype(np.int32)

        final_alpha = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
        return DDIMScheduler(
            num_train_timesteps=num_train_timesteps,
            timesteps=timesteps,
            alphas_cumprod=alphas_cumprod,
            final_alpha_cumprod=final_alpha,
        )

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    # ---- per-step alpha-bar tables (static, precomputed on host) ----------

    def sample_alpha_pair(self, i: int | jnp.ndarray):
        """(alpha_bar_t, alpha_bar_prev) for denoising step ``i`` (0 = most
        noisy). ``alpha_bar_prev`` for the last step is ``final_alpha_cumprod``
        (reference: generate.py:293-298)."""
        a_t = self.alphas_cumprod[self.timesteps]
        a_prev = np.concatenate([
            self.alphas_cumprod[self.timesteps[1:]],
            np.array([self.final_alpha_cumprod], dtype=np.float32),
        ])
        return jnp.asarray(a_t)[i], jnp.asarray(a_prev)[i]

    def inversion_alpha_pair(self, i: int | jnp.ndarray):
        """(alpha_bar_t, alpha_bar_prev) for inversion step ``i`` where the
        loop walks timesteps in *ascending* order (reference: invert.py:184-192
        indexes ``reversed(timesteps)``; step 0 uses ``final_alpha_cumprod``
        as the previous alpha-bar)."""
        ts_up = self.timesteps[::-1]
        a_t = self.alphas_cumprod[ts_up]
        a_prev = np.concatenate([
            np.array([self.final_alpha_cumprod], dtype=np.float32),
            self.alphas_cumprod[ts_up[:-1]],
        ])
        return jnp.asarray(a_t)[i], jnp.asarray(a_prev)[i]


def ddim_step(x: jnp.ndarray, eps: jnp.ndarray, alpha_t, alpha_prev) -> jnp.ndarray:
    """One deterministic DDIM denoising update x_t -> x_{t-1}
    (reference: generate.py:299-309, inversion=False branch)."""
    mu = jnp.sqrt(alpha_t)
    sigma = jnp.sqrt(1.0 - alpha_t)
    mu_prev = jnp.sqrt(alpha_prev)
    sigma_prev = jnp.sqrt(1.0 - alpha_prev)
    pred_x0 = (x - sigma * eps) / mu
    return mu_prev * pred_x0 + sigma_prev * eps


def ddim_inverse_step(x: jnp.ndarray, eps: jnp.ndarray, alpha_t, alpha_prev) -> jnp.ndarray:
    """One DDIM inversion update x_{t-1} -> x_t (reference: invert.py:204-206,
    inversion=True branch: reconstruct x0 under the *previous* (less noisy)
    alpha-bar, then renoise under the current one)."""
    mu = jnp.sqrt(alpha_t)
    sigma = jnp.sqrt(1.0 - alpha_t)
    mu_prev = jnp.sqrt(alpha_prev)
    sigma_prev = jnp.sqrt(1.0 - alpha_prev)
    pred_x0 = (x - sigma_prev * eps) / mu_prev
    return mu * pred_x0 + sigma * eps
