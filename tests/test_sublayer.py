"""Fused cross-attention sublayer kernel (ops/sublayer.py) vs the jnp
oracle, across the UNet shape classes (SD1.5's non-lane-aligned D=40
included) in Pallas interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidtome_tpu.ops.sublayer import (fused_cross_sublayer,
                                      reference_cross_sublayer)


def _make(B, S, C, heads, kv=77, seed=0):
    ks = jax.random.split(jax.random.key(seed), 12)
    bf = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, S, C), bf)
    a1 = 0.5 * jax.random.normal(ks[1], (B, S, C), bf)
    k = jax.random.normal(ks[2], (B, kv, C), bf)
    v = jax.random.normal(ks[3], (B, kv, C), bf)
    wq = (jax.random.normal(ks[4], (C, C), jnp.float32)
          / np.sqrt(C)).astype(bf)
    wout = (jax.random.normal(ks[5], (C, C), jnp.float32)
            / np.sqrt(C)).astype(bf)
    bout = 0.1 * jax.random.normal(ks[6], (C,), jnp.float32)
    g2 = 1.0 + 0.1 * jax.random.normal(ks[7], (C,), jnp.float32)
    b2 = 0.1 * jax.random.normal(ks[8], (C,), jnp.float32)
    g3 = 1.0 + 0.1 * jax.random.normal(ks[9], (C,), jnp.float32)
    b3 = 0.1 * jax.random.normal(ks[10], (C,), jnp.float32)
    return x, a1, k, v, wq, wout, bout, g2, b2, g3, b3


# (B, S, C, heads): SD1.5 levels (D=40/80/160 — none lane-aligned),
# SD2.x-style D=64, an SDXL-ish wide block, and a ragged-S case
SHAPES = [
    (2, 256, 320, 8),
    (2, 64, 640, 8),
    (1, 64, 1280, 8),
    (2, 128, 640, 10),   # D=64
    (1, 40, 320, 8),     # S not a multiple of the row tile
]


@pytest.mark.parametrize("B,S,C,heads", SHAPES)
def test_matches_oracle(B, S, C, heads):
    args = _make(B, S, C, heads)
    x3r, y3r = reference_cross_sublayer(*args, heads=heads, kv_len=77)
    x3, y3 = fused_cross_sublayer(*args, heads=heads, kv_len=77,
                                  interpret=True)
    assert x3.shape == (B, S, C) and y3.shape == (B, S, C)
    np.testing.assert_allclose(
        np.asarray(x3, np.float32), np.asarray(x3r, np.float32),
        rtol=0.05, atol=0.05)
    np.testing.assert_allclose(
        np.asarray(y3, np.float32), np.asarray(y3r, np.float32),
        rtol=0.05, atol=0.08)


def test_kv_mask_is_exact():
    """Padded KV rows must not leak: kv_len=77 vs physically 77 rows
    gives identical results when the padding carries garbage."""
    args = list(_make(2, 64, 320, 8, kv=77))
    x3a, y3a = fused_cross_sublayer(*args, heads=8, kv_len=77,
                                    interpret=True)
    # append garbage KV rows; kv_len still 77
    pad = jnp.full((2, 51, 320), 37.0, jnp.bfloat16)
    args2 = list(args)
    args2[2] = jnp.concatenate([args[2], pad], axis=1)
    args2[3] = jnp.concatenate([args[3], pad], axis=1)
    x3b, y3b = fused_cross_sublayer(*args2, heads=8, kv_len=77,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(x3a, np.float32),
                                  np.asarray(x3b, np.float32))
    np.testing.assert_array_equal(np.asarray(y3a, np.float32),
                                  np.asarray(y3b, np.float32))


def _block(mode, tome=None):
    from vidtome_tpu.models.layers import TransformerBlock

    return TransformerBlock(dim=64, heads=4, head_dim=16, context_dim=32,
                            downsample=1, tome=tome, dtype=jnp.bfloat16,
                            use_pallas=True, sublayer_mode=mode)


def test_block_param_tree_identical_across_modes():
    """sublayer_mode must not change the parameter tree: same names,
    shapes, and init values (identical RNG stream)."""
    x = jnp.zeros((2, 16, 64), jnp.bfloat16)
    ctx = jnp.zeros((2, 7, 32), jnp.bfloat16)
    key = jax.random.key(0)
    p_off = _block("off").init(key, x, ctx)["params"]
    # interpret-mode init on CPU: use_pallas=True forces the fused branch
    p_fused = jax.eval_shape(
        lambda k: _block("fused").init(k, x, ctx)["params"], key)
    flat_off = jax.tree_util.tree_leaves_with_path(p_off)
    flat_fused = jax.tree_util.tree_leaves_with_path(p_fused)
    assert [(p, l.shape) for p, l in flat_off] == \
        [(p, l.shape) for p, l in flat_fused]
    # real init values match too (same param creation order -> same folds)
    p_fused_real = _block("fused").init(key, x, ctx)["params"]
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(p_off),
            jax.tree_util.tree_leaves_with_path(p_fused_real)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la, np.float32),
                                      np.asarray(lb, np.float32))


def test_block_fused_matches_standard():
    """The fused sublayer path reproduces the standard XLA path on the
    same params (interpret mode)."""
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(k1, (2, 16, 64), jnp.bfloat16)
    ctx = jax.random.normal(k2, (2, 7, 32), jnp.bfloat16)
    params = _block("off").init(k3, x, ctx)["params"]
    y_off = _block("off").apply({"params": params}, x, ctx)
    y_fused = _block("fused").apply({"params": params}, x, ctx)
    np.testing.assert_allclose(np.asarray(y_fused, np.float32),
                               np.asarray(y_off, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.slow
def test_block_fused_with_merging_matches_standard():
    """Fused sublayer under active ToMe merging (merging wraps only
    attn1; the fused chain sits after the unmerge)."""
    from vidtome_tpu.models.tome import ToMeCall, ToMeConfig

    tome = ToMeConfig(frames=2, local_merge_ratio=0.5, merge_global=False,
                      global_merge_ratio=0.5, global_rand=0.5,
                      max_downsample=2, target_stride=2, align_batch=False)
    k1, k2, k3 = jax.random.split(jax.random.key(2), 3)
    x = jax.random.normal(k1, (4, 16, 64), jnp.bfloat16)
    ctx = jax.random.normal(k2, (4, 7, 32), jnp.bfloat16)
    call = ToMeCall(key=jax.random.key(9), bank_mode="off")
    params = _block("off", tome).init(k3, x, ctx, tome_call=call)["params"]
    y_off = _block("off", tome).apply({"params": params}, x, ctx,
                                      tome_call=call)
    y_fused = _block("fused", tome).apply({"params": params}, x, ctx,
                                          tome_call=call)
    np.testing.assert_allclose(np.asarray(y_fused, np.float32),
                               np.asarray(y_off, np.float32),
                               rtol=0.05, atol=0.05)


def test_residual_identity_when_attention_silent():
    """With wout = 0 and bout = 0 the chain reduces to x3 = x + a1 and
    y3 = LN3(x3) — pins the residual wiring independent of attention."""
    x, a1, k, v, wq, wout, bout, g2, b2, g3, b3 = _make(2, 64, 320, 8)
    wout = jnp.zeros_like(wout)
    bout = jnp.zeros_like(bout)
    x3, y3 = fused_cross_sublayer(x, a1, k, v, wq, wout, bout,
                                  g2, b2, g3, b3, heads=8, kv_len=77,
                                  interpret=True)
    expect = (x.astype(jnp.float32) + a1.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(x3, np.float32),
                               np.asarray(expect.astype(jnp.bfloat16),
                                          np.float32), rtol=0.02,
                               atol=0.02)
    assert np.isfinite(np.asarray(y3, np.float32)).all()
