"""Attention ops: Pallas flash attention for TPU + a reference jnp oracle.

This is the hot path of the whole framework: every UNet transformer block
runs self-attention over *merged* multi-frame token sequences (~1.2k-11k
tokens after local/global merging at 512p) and cross-attention against 77
text tokens.  The reference delegates this to xformers CUDA kernels
(`invert.py:39-43` in lixirui142/VidToMe); here it is a Pallas TPU kernel:

  * online-softmax tiling (never materializes the [S, S] score matrix),
  * fp32 running statistics with deferred normalization,
  * padding masks on the KV axis so merged sequences (whose lengths are
    static but not 128-aligned) pad to MXU-friendly tiles,
  * batch*heads folded into one parallel grid axis; KV is the sequential
    ("arbitrary") axis so accumulators live in VMEM scratch across tiles.

Inference-only (no VJP) — the pipeline is zero-shot, nothing backprops.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
_LOG2E = math.log2(math.e)  # softmax in base 2: exp2 is the native VPU
                            # transcendental; fold log2(e) into the q scale
                            # once instead of an extra multiply (or a
                            # costlier exp) per score element.


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def reference_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid_len: int | None = None,
    sm_scale: float | None = None,
) -> jnp.ndarray:
    """Plain softmax attention oracle. q,k,v: [B, H, S, D]."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    if kv_valid_len is not None and kv_valid_len < k.shape[2]:
        mask = jnp.arange(k.shape[2]) < kv_valid_len
        s = jnp.where(mask[None, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr, *,
                  kv_len: int, block_k: int, head_dim: int,
                  num_kv_tiles: int, needs_mask: bool):
    """Online-softmax tile.  ``v_ref`` carries an appended ones column
    (``head_dim + 1`` lanes): the PV matmul then accumulates the softmax
    row sums on the MXU for free, replacing a VPU lane-reduction over the
    whole [block_q, block_k] probability tile (the kernel is VPU/VMEM
    bound at SD head dims, so every vector pass over the score tile
    counts)."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [block_q, D] — sm_scale pre-folded into q by the caller
    k = k_ref[0]  # [block_k, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_q, block_k]

    # Mask padded/invalid KV columns (static kv_len baked per compile).
    # When kv_len covers the whole padded sequence the mask compiles away.
    if needs_mask:
        col = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                          s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[...]  # [block_q, 128] (lanes equal)
    m_curr = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    # base-2 softmax: s already carries the log2(e) factor (caller folds it
    # into q), so exp2 here computes the same weights as exp on raw scores
    alpha = jnp.exp2(m_prev - m_next)  # [block_q, 128]
    m_scr[...] = m_next

    p = jnp.exp2(s - jnp.broadcast_to(m_next[:, :1], s.shape))
    v = v_ref[0]  # [block_k, D + 1] (last column = ones)
    pv = jax.lax.dot(p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)  # [block_q, D + 1]
    acc_scr[...] = acc_scr[...] * jnp.broadcast_to(
        alpha[:, :1], acc_scr.shape) + pv

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        l = acc_scr[...][:, head_dim:head_dim + 1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * jnp.broadcast_to(l_inv, acc_scr.shape)
                    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kv_valid_len", "sm_scale", "block_q", "block_k",
                     "interpret"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid_len: int | None = None,
    sm_scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention. q: [B, H, Sq, D]; k, v: [B, H, Skv, D] -> [B, H, Sq, D].

    ``kv_valid_len``: number of real KV tokens (rest of Skv is padding to be
    masked).  Q-side padding needs no mask — padded query rows produce
    garbage that the caller slices off.

    Default 1024x1024 blocks (best overall in the v5e sweep; a per-width
    heuristic regressed end-to-end despite winning isolated microbenches).
    """
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    kv_len = Skv if kv_valid_len is None else kv_valid_len

    # Pick blocks that DIVIDE the sequence when possible: the merge engine
    # quantizes merged lengths (core/merge.quantize_r) exactly so the
    # kernel can run mask- and pad-free.  1024 is the measured v5e sweet
    # spot at UNet head dims (40-160); at the VAE decoder's D=512
    # mid-attention the 1024-block working set (q/k/v/out tiles + fp32
    # accumulator, double-buffered) exceeds the 16MB scoped-VMEM limit
    # once Sq is large (SDXL 1024p decode: Sq=16384 OOMed by 784K), so
    # large head dims cap at 512.
    def pick_block(S, requested):
        cap = requested or (1024 if D <= 256 else 512)
        # honor an explicitly requested size first (e.g. block_q=2048)
        # before walking the default ladder
        candidates = ((cap,) if requested else ()) + (1024, 512, 256)
        for b in candidates:
            if b <= cap and S % b == 0:
                return b
        return min(cap, _round_up(S, 128))

    block_q = pick_block(Sq, block_q)
    block_k = pick_block(Skv, block_k)
    Sq_p = _round_up(Sq, block_q)
    Skv_p = _round_up(Skv, block_k)

    # Fold the softmax scale AND the base-2 conversion into q: one cheap
    # [Sq, D] pass instead of per-tile multiplies (the kernel uses exp2).
    q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0)))
    # ones column on v: PV accumulates softmax row sums on the MXU
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 1)),
                 constant_values=1.0)
    if Skv_p > Skv:  # padded KV rows must not contribute to the row sums
        vp = vp.at[:, :, Skv:, D].set(0.0)

    qf = qp.reshape(B * H, Sq_p, D)
    kf = kp.reshape(B * H, Skv_p, D)
    vf = vp.reshape(B * H, Skv_p, D + 1)

    num_kv_tiles = Skv_p // block_k
    grid = (B * H, Sq_p // block_q, num_kv_tiles)

    kernel = functools.partial(
        _flash_kernel,
        kv_len=kv_len,
        block_k=block_k,
        head_dim=D,
        num_kv_tiles=num_kv_tiles,
        needs_mask=kv_len < Skv_p,
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, Sq_p, D + 1), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D + 1), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D + 1),
                               lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),     # running max
            pltpu.VMEM((block_q, D + 1), jnp.float32),   # out acc | row sum
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)

    return out.reshape(B, H, Sq_p, D + 1)[:, :, :Sq, :D]


def _small_kv_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int,
                     skv_p: int):
    """Cross-attention with the whole K/V resident in one tile (77 text
    tokens padded to 128): single pass, no online-softmax state.  The
    tiled flash kernel is pure overhead here, and the XLA path spends
    ~2.3ms per L0 block on layout/softmax passes for ~6 GFLOP of work —
    this kernel reads each q tile once and writes o once."""
    q = q_ref[0]  # [block_q, D] — scale * log2(e) pre-folded by caller
    k = k_ref[0]  # [skv_p, D]
    v = v_ref[0]  # [skv_p, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_len < skv_p:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - jnp.broadcast_to(m, s.shape))
    l = jnp.sum(p, axis=1, keepdims=True)
    p = p * (1.0 / jnp.maximum(l, 1e-30))
    o_ref[0] = jax.lax.dot(p.astype(v.dtype), v,
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kv_valid_len", "sm_scale", "block_q", "interpret"),
)
def small_kv_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid_len: int | None = None,
    sm_scale: float | None = None,
    block_q: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention where the full KV fits one tile (Skv <= ~512).
    q: [B, H, Sq, D]; k, v: [B, H, Skv, D] -> [B, H, Sq, D]."""
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    kv_len = Skv if kv_valid_len is None else kv_valid_len

    block_q = min(block_q, _round_up(Sq, 128))
    Sq_p = _round_up(Sq, block_q)
    Skv_p = _round_up(Skv, 128)

    q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0)))

    qf = qp.reshape(B * H, Sq_p, D)
    kf = kp.reshape(B * H, Skv_p, D)
    vf = vp.reshape(B * H, Skv_p, D)

    kernel = functools.partial(_small_kv_kernel, kv_len=kv_len, skv_p=Skv_p)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, Sq_p, D), q.dtype),
        grid=(B * H, Sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Skv_p, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Skv_p, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, Sq_p, D)[:, :, :Sq]


# KV lengths at or below this take the XLA path on TPU (cross-attention
# against 77 text tokens): measured v5e ranking at the L0 shape
# [8,8,4096,40]x77 is XLA 1.42ms < small_kv_attention 2.75ms <
# tiled flash 6.7ms (tools/profile_hotpath.py + /tmp bench).  The
# dedicated single-pass kernel loses because D=40 lane-pads to 128 in
# VMEM (3x read/write traffic); XLA keeps the [B,S,H*D] layout fused.
# small_kv_attention is kept (tested) for wider-head configs.
_SMALL_KV_XLA = 256


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid_len: int | None = None,
    sm_scale: float | None = None,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Dispatch: Pallas flash attention for long KV on TPU, XLA otherwise.
    q,k,v: [B, H, S, D]."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and k.shape[2] > _SMALL_KV_XLA:
        return flash_attention(q, k, v, kv_valid_len=kv_valid_len,
                               sm_scale=sm_scale)
    return reference_attention(q, k, v, kv_valid_len=kv_valid_len,
                               sm_scale=sm_scale)
