"""Fused GroupNorm(+SiLU) kernel vs flax nn.GroupNorm (interpret mode)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidtome_tpu.ops.groupnorm import (full_group_norm, fused_group_norm,
                                       group_norm, reference_group_norm)


def _flax_gn(x, scale, bias, groups, eps=1e-5):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=x.dtype)
    return gn.apply({"params": {"scale": scale, "bias": bias}}, x)


@pytest.mark.parametrize("B,rows,C,G", [
    (2, 64, 320, 32),     # SD L0 channel count (lane padding 320 -> 384)
    (1, 128, 128, 32),    # exactly lane-aligned
    (3, 16, 64, 32),      # tiny-config channels
    (2, 64, 640, 32),     # SD L1
])
def test_matches_flax(B, rows, C, G):
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, rows, C), jnp.float32) * 2 + 0.5
    scale = jax.random.normal(jax.random.fold_in(key, 1), (C,)) + 1.0
    bias = jax.random.normal(jax.random.fold_in(key, 2), (C,))
    want = _flax_gn(x, scale, bias, G)
    got = fused_group_norm(x, scale, bias, G, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("B,rows,C,G,silu", [
    (2, 64, 320, 32, False),    # L0-ish tile
    (2, 64, 320, 32, True),     # fused activation
    (1, 128, 128, 32, False),   # lane-aligned
    (2, 256, 640, 32, True),    # multi-tile rows (block 64/128/256)
    (2, 100, 64, 32, False),    # rows <= 1024 single-tile fallback path
])
def test_full_gn_matches_flax(B, rows, C, G, silu):
    key = jax.random.key(11)
    x = jax.random.normal(key, (B, rows, C), jnp.float32) * 1.5 + 0.25
    scale = jax.random.normal(jax.random.fold_in(key, 1), (C,)) + 1.0
    bias = jax.random.normal(jax.random.fold_in(key, 2), (C,))
    want = _flax_gn(x, scale, bias, G)
    if silu:
        want = jax.nn.silu(want)
    got = full_group_norm(x, scale, bias, G, silu=silu, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_silu_fusion_matches_separate():
    key = jax.random.key(3)
    x = jax.random.normal(key, (2, 64, 320), jnp.float32)
    scale = jnp.ones((320,))
    bias = jnp.zeros((320,))
    want = jax.nn.silu(_flax_gn(x, scale, bias, 32))
    got = fused_group_norm(x, scale, bias, 32, silu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_bf16_io_fp32_stats():
    key = jax.random.key(4)
    x = jax.random.normal(key, (2, 64, 320), jnp.bfloat16)
    scale = jnp.ones((320,), jnp.float32)
    bias = jnp.zeros((320,), jnp.float32)
    want = _flax_gn(x, scale, bias, 32)
    got = fused_group_norm(x, scale, bias, 32, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_reference_matches_flax_4d():
    key = jax.random.key(5)
    x = jax.random.normal(key, (2, 8, 8, 64), jnp.float32)
    scale = jax.random.normal(jax.random.fold_in(key, 1), (64,)) + 1.0
    bias = jax.random.normal(jax.random.fold_in(key, 2), (64,))
    want = _flax_gn(x, scale, bias, 32)
    got = reference_group_norm(x, scale, bias, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_dispatcher_fallbacks():
    """Non-TPU backends take the XLA path; output matches flax."""
    key = jax.random.key(6)
    x = jax.random.normal(key, (1, 32, 32, 64), jnp.float32)
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    got = group_norm(x, scale, bias, 32, use_pallas=False)
    want = _flax_gn(x, scale, bias, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pallas_eligibility_guards():
    """Kernel only engages for large, lane-friendly, moderate-width slabs;
    the env var is a hard off switch."""
    from vidtome_tpu.ops.groupnorm import pallas_eligible

    big = jnp.zeros((1, 256, 128, 128))       # rows 32768 >= threshold
    assert pallas_eligible(big, use_pallas=True)
    small = jnp.zeros((1, 64, 64, 320))       # UNet-scale: stays XLA/flax
    assert not pallas_eligible(small, use_pallas=True)
    wide = jnp.zeros((1, 256, 128, 2560))     # skip-concat width: too wide
    assert not pallas_eligible(wide, use_pallas=True)
    assert not pallas_eligible(big, use_pallas=False)
    import os

    os.environ["VIDTOME_DISABLE_PALLAS_GN"] = "1"
    try:
        assert not pallas_eligible(big, use_pallas=True)
    finally:
        del os.environ["VIDTOME_DISABLE_PALLAS_GN"]
