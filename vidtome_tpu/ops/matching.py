"""Fused similarity matching: cosine-score matmul + row max/argmax in one
Pallas kernel.

The bipartite matching (core/merge.py) needs, for every src token, only its
*best* dst token and that score — but a naive implementation materializes
the full [S, D] score matrix in HBM just to reduce it (at 512p that is
~400 MB per block forward, making matching memory-bound).  This kernel
streams dst tiles through VMEM keeping a running (max, argmax) per src row,
so scores never leave the chip.  align_batch mode ("one matching shared by
all CFG/PnP lanes", reference merge.py:93-108) folds the batch into the dst
axis and reduces over that too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -jnp.inf


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _match_kernel(src_ref, dst_ref, max_ref, idx_ref, m_scr, i_scr, *,
                  block_d: int, d_valid: int, num_d_tiles: int):
    d_idx = pl.program_id(2)

    @pl.when(d_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG)
        i_scr[...] = jnp.zeros_like(i_scr)

    s = jax.lax.dot_general(
        src_ref[0], dst_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_s, block_d]
    col = d_idx * block_d + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < d_valid, s, _NEG)

    tile_max = jnp.max(s, axis=1, keepdims=True)             # [block_s, 1]
    tile_arg = jnp.argmax(s, axis=1).astype(jnp.int32)[:, None] + d_idx * block_d

    m_prev = m_scr[...][:, :1]
    better = tile_max > m_prev
    m_scr[...] = jnp.broadcast_to(jnp.where(better, tile_max, m_prev),
                                  m_scr.shape)
    i_prev = i_scr[...][:, :1]
    i_scr[...] = jnp.broadcast_to(jnp.where(better, tile_arg, i_prev),
                                  i_scr.shape)

    @pl.when(d_idx == num_d_tiles - 1)
    def _store():
        # outputs are lane-padded [block_s, 128] tiles (TPU block layout
        # wants >= (8, 128)); all lanes hold the same value, caller slices
        # lane 0.
        max_ref[0] = m_scr[...]
        idx_ref[0] = i_scr[...]


@functools.partial(jax.jit, static_argnames=("block_s", "block_d",
                                             "interpret"))
def best_match(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    block_s: int = 1024,
    block_d: int = 1024,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-src best dst: src [B, S, C], dst [B, D, C] (pre-normalized)
    -> (max_score [B, S] f32, argmax [B, S] i32)."""
    B, S, C = src.shape
    D = dst.shape[1]
    block_s = min(block_s, _round_up(S, 128))
    block_d = min(block_d, _round_up(D, 128))
    S_p, D_p = _round_up(S, block_s), _round_up(D, block_d)

    src_p = jnp.pad(src, ((0, 0), (0, S_p - S), (0, 0)))
    dst_p = jnp.pad(dst, ((0, 0), (0, D_p - D), (0, 0)))
    num_d_tiles = D_p // block_d

    kernel = functools.partial(_match_kernel, block_d=block_d, d_valid=D,
                               num_d_tiles=num_d_tiles)
    mx, ix = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, S_p, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, S_p, 128), jnp.int32),
        ),
        grid=(B, S_p // block_s, num_d_tiles),
        in_specs=[
            pl.BlockSpec((1, block_s, C), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_d, C), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_s, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_s, 128), lambda b, i, j: (b, i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_s, 128), jnp.float32),
            pltpu.VMEM((block_s, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(src_p, dst_p)
    return mx[:, :S, 0], ix[:, :S, 0]


def best_match_reference(src: jnp.ndarray, dst: jnp.ndarray):
    """jnp oracle (materializes scores)."""
    scores = jnp.einsum("bsc,bdc->bsd", src.astype(jnp.bfloat16),
                        dst.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    return jnp.max(scores, axis=-1), jnp.argmax(scores, axis=-1).astype(
        jnp.int32)
