"""Misc utilities: seeding (reference utils/utils.py:70-74)."""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX key.  Unlike the reference
    (global torch/cuda state), all device randomness flows from the returned
    key explicitly."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)
