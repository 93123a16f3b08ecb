"""Flash attention kernel vs reference oracle (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidtome_tpu.ops.attention import (flash_attention, reference_attention)


def _qkv(key, B, H, Sq, Skv, D, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, Sq, D), dtype)
    k = jax.random.normal(kk, (B, H, Skv, D), dtype)
    v = jax.random.normal(kv, (B, H, Skv, D), dtype)
    return q, k, v


@pytest.mark.parametrize("Sq,Skv,D", [
    (256, 256, 64),      # aligned self-attention
    (300, 300, 40),      # unaligned merged-token sequence, SD1.5 head dim
    (512, 77, 64),       # cross-attention vs text tokens
    (128, 1024, 160),    # long kv, SD mid-block head dim
    (1024, 1024, 512),   # VAE decoder mid-attention head dim (D=512 caps
                         # blocks at 512 — the SDXL 1024p decode VMEM fix)
])
def test_flash_matches_reference(Sq, Skv, D):
    q, k, v = _qkv(jax.random.key(0), 2, 3, Sq, Skv, D)
    expected = reference_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-3, atol=2e-3)


def test_large_head_dim_default_blocks():
    """Default block selection at D=512 (VAE decoder mid-attention) must
    cap at 512 and stay correct — at block 1024 the double-buffered
    working set exceeds the 16MB scoped-VMEM limit on real TPUs (the
    SDXL 1024p decode OOM)."""
    q, k, v = _qkv(jax.random.key(3), 1, 1, 1024, 1024, 512)
    expected = reference_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True)  # default blocks
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-3, atol=2e-3)


def test_kv_padding_mask():
    """Padded KV tokens must not contribute: result with kv_valid_len == n
    equals attention over only the first n tokens."""
    Sq, Skv, n, D = 64, 256, 200, 32
    q, k, v = _qkv(jax.random.key(1), 1, 2, Sq, Skv, D)
    expected = reference_attention(q, k[:, :, :n], v[:, :, :n])
    got = flash_attention(q, k, v, kv_valid_len=n, interpret=True,
                          block_q=64, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-3, atol=2e-3)


def test_kv_mask_applies_when_valid_len_is_tile_aligned():
    """Regression: kv_valid_len that is a multiple of block_k but smaller
    than the padded sequence must still be masked (junk columns between
    kv_valid_len and Skv, plus the zero padding, must not attend)."""
    Sq, Skv, n, D = 64, 200, 128, 32
    q, k, v = _qkv(jax.random.key(7), 1, 2, Sq, Skv, D)
    k = k.at[:, :, n:].set(1e3)  # poison the invalid region
    expected = reference_attention(q, k[:, :, :n], v[:, :, :n])
    got = flash_attention(q, k, v, kv_valid_len=n, interpret=True,
                          block_q=64, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-3, atol=2e-3)


def test_reference_mask_matches_slicing():
    q, k, v = _qkv(jax.random.key(2), 1, 1, 32, 128, 16)
    a = reference_attention(q, k, v, kv_valid_len=90)
    b = reference_attention(q, k[:, :, :90], v[:, :, :90])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_sm_scale_default():
    q, k, v = _qkv(jax.random.key(3), 1, 1, 64, 64, 32)
    a = reference_attention(q, k, v)
    b = reference_attention(q, k, v, sm_scale=1.0 / math.sqrt(32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_bf16_inputs():
    q, k, v = _qkv(jax.random.key(4), 1, 2, 256, 256, 64, dtype=jnp.bfloat16)
    expected = reference_attention(q.astype(jnp.float32),
                                   k.astype(jnp.float32),
                                   v.astype(jnp.float32))
    got = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(expected), rtol=5e-2, atol=5e-2)


class TestSmallKVKernel:
    """Single-pass small-KV cross-attention kernel vs the oracle."""

    @pytest.mark.parametrize("Sq,Skv,D", [
        (256, 77, 40),       # SD1.5 L0 cross-attention shape
        (300, 77, 64),       # unaligned q, SD2.x head dim
        (128, 128, 40),      # exactly one KV tile, no mask needed
        (1100, 64, 160),     # q spills past one block, mid-block head dim
    ])
    def test_matches_reference(self, Sq, Skv, D):
        from vidtome_tpu.ops.attention import small_kv_attention

        q, k, v = _qkv(jax.random.key(3), 2, 3, Sq, Skv, D)
        expected = reference_attention(q, k, v)
        got = small_kv_attention(q, k, v, interpret=True, block_q=256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-3, atol=2e-3)

    def test_kv_valid_len_masks_tail(self):
        from vidtome_tpu.ops.attention import small_kv_attention

        q, k, v = _qkv(jax.random.key(4), 1, 2, 128, 96, 40)
        n = 77
        expected = reference_attention(q, k[:, :, :n], v[:, :, :n])
        got = small_kv_attention(q, k, v, kv_valid_len=n, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-3, atol=2e-3)

    def test_bf16(self):
        from vidtome_tpu.ops.attention import small_kv_attention

        q, k, v = _qkv(jax.random.key(5), 1, 2, 256, 77, 40, jnp.bfloat16)
        expected = reference_attention(q, k, v)
        got = small_kv_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(expected, np.float32),
            rtol=3e-2, atol=3e-2)
