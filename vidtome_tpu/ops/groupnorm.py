"""GroupNorm(+SiLU) with a Pallas statistics kernel for TPU.

GroupNorm is a large share of the production step time under XLA
(measured via tools/trace_ops.py: norm/softmax statistic reductions are
123ms of a 455ms step — ~0.26ms per instance for a bandwidth-bound op
whose ideal cost is tens of microseconds).  XLA's spatial-reduce emission
is the slow part; the normalize itself fuses fine.

Split accordingly:

  * statistics — a row-tiled Pallas kernel: masked channel sums and
    sum-of-squares accumulate in fp32 VMEM scratch across row tiles; the
    final tile converts channel moments to group moments with two small
    factored matmuls ([C, G] collapse then [G, C] broadcast — NOT a
    [C, C] matrix, which at the up-block concat width C=2560 would be a
    26MB VMEM constant and blow the scoped-vmem limit) and emits
    per-channel mean and rsqrt(var + eps).
  * normalize (+ optional SiLU) — plain jnp; XLA fuses it into a single
    elementwise pass, and fusing SiLU here removes the separate
    activation pass that follows every resnet GroupNorm.

Total traffic: 2 reads + 1 write of the activation vs XLA's 4+.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_block_rows(rows: int) -> int | None:
    """Row-tile size for the stats kernel: the largest divisor of ``rows``
    from the candidate ladder.  Returns None when only degenerate tilings
    exist — a sub-64 tile means 100s-1000s of sequential grid steps, and
    'no divisor at all' would force a whole-slab tile that can exceed VMEM
    on large inputs; both cases should take the XLA path instead."""
    for cand in (1024, 512, 256, 128, 64):
        if rows % cand == 0:
            return cand
    if rows <= 1024:  # small enough for a single tile
        return rows
    return None


def reference_group_norm(x, scale, bias, num_groups: int,
                         eps: float = 1e-5, silu: bool = False):
    """XLA oracle: x [B, ..., C] -> same shape, stats in fp32."""
    B, C = x.shape[0], x.shape[-1]
    xf = x.reshape(B, -1, num_groups, C // num_groups).astype(jnp.float32)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(B, -1, C) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype).reshape(x.shape)


def _stats_kernel(x_ref, gdown_ref, gup_ref, o_ref, acc_scr, *,
                  c: int, eps: float, num_tiles: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    x = x_ref[0]  # [block_rows, Cp]
    xf = x.astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1]), 1)
    xm = jnp.where(lane < c, xf, 0.0)
    acc_scr[0:1, :] += jnp.sum(xm, axis=0, keepdims=True)
    acc_scr[1:2, :] += jnp.sum(xm * xm, axis=0, keepdims=True)

    @pl.when(t == num_tiles - 1)
    def _finish():
        s = acc_scr[...]  # [2, Cp] channel sums / sumsq
        # collapse channels -> groups (already scaled by 1/count), then
        # broadcast groups -> channels
        g = jax.lax.dot(s, gdown_ref[...],
                        preferred_element_type=jnp.float32)  # [2, Gp]
        m = jax.lax.dot(g, gup_ref[...],
                        preferred_element_type=jnp.float32)  # [2, Cp]
        mean = m[0:1, :]
        # clamp: E[x^2] - mean^2 can go slightly negative under fp32
        # cancellation (large-mean low-variance slabs); nn.GroupNorm clamps
        # too, so without this the Pallas path could NaN where XLA doesn't
        var = jnp.maximum(m[1:2, :] - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        o_ref[0] = jnp.concatenate([mean, inv], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "interpret"),
)
def group_norm_stats(x, num_groups: int, eps: float = 1e-5,
                     interpret: bool = False):
    """x: [B, rows, C] -> (mean, inv) each [B, C] fp32 per-channel
    (constant within a group): inv = rsqrt(var + eps)."""
    B, rows, C = x.shape
    gsize = C // num_groups
    Cp = _round_up(C, _LANES)
    Gp = _round_up(num_groups, _LANES)

    block_rows = _pick_block_rows(rows)
    if block_rows is None:
        # No reasonable tiling (huge prime-ish row count, or only tiny
        # divisors that would mean thousands of sequential grid tiles /
        # a whole-slab tile blowing VMEM): compute the stats in plain XLA.
        xf = x.astype(jnp.float32).reshape(B, rows, num_groups, gsize)
        mean_g = xf.mean(axis=(1, 3))                       # [B, G]
        var_g = jnp.maximum(
            (xf * xf).mean(axis=(1, 3)) - mean_g * mean_g, 0.0)
        mean = jnp.repeat(mean_g, gsize, axis=-1)
        inv = jnp.repeat(jax.lax.rsqrt(var_g + eps), gsize, axis=-1)
        return mean, inv
    num_tiles = rows // block_rows

    gdown = np.zeros((Cp, Gp), np.float32)
    gup = np.zeros((Gp, Cp), np.float32)
    for ch in range(C):
        g = ch // gsize
        gdown[ch, g] = 1.0 / (rows * gsize)
        gup[g, ch] = 1.0
    kernel = functools.partial(_stats_kernel, c=C, eps=eps,
                               num_tiles=num_tiles)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 2, Cp), jnp.float32),
        grid=(B, num_tiles),
        in_specs=[
            pl.BlockSpec((1, block_rows, Cp), lambda b, t: (b, t, 0)),
            pl.BlockSpec((Cp, Gp), lambda b, t: (0, 0)),
            pl.BlockSpec((Gp, Cp), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, Cp), lambda b, t: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, Cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.pad(x, ((0, 0), (0, 0), (0, Cp - C))) if Cp != C else x,
      jnp.asarray(gdown), jnp.asarray(gup))
    return out[:, 0, :C], out[:, 1, :C]


def _full_gn_kernel(x_ref, sb_ref, gdown_ref, gup_ref, o_ref, acc_scr, *,
                    c: int, eps: float, silu: bool):
    """Two-phase GroupNorm(+SiLU) in ONE pallas call: the grid visits each
    row tile twice (phase 0: accumulate channel sums/sumsq in fp32 scratch;
    phase 1: normalize+affine+SiLU and write out).  Eliminates the
    XLA-boundary between the statistics reduce and the normalize pass —
    the round-2 stats-only kernel paid pallas call overhead ON TOP of
    XLA's elementwise pass and lost at UNet scales (DESIGN.md §8.1); this
    kernel replaces both."""
    phase = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when((phase == 0) & (t == 0))
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(phase == 0)
    def _accumulate():
        xf = x_ref[0].astype(jnp.float32)  # [block_rows, Cp]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, xf.shape[1]), 1)
        xm = jnp.where(lane < c, xf, 0.0)
        acc_scr[0:1, :] += jnp.sum(xm, axis=0, keepdims=True)
        acc_scr[1:2, :] += jnp.sum(xm * xm, axis=0, keepdims=True)

    @pl.when((phase == 1) & (t == 0))
    def _finalize():
        s = acc_scr[...]  # [2(+2), Cp] channel sums / sumsq
        g = jax.lax.dot(s[0:2], gdown_ref[...],
                        preferred_element_type=jnp.float32)  # [2, Gp]
        m = jax.lax.dot(g, gup_ref[...],
                        preferred_element_type=jnp.float32)  # [2, Cp]
        mean = m[0:1, :]
        var = jnp.maximum(m[1:2, :] - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        # fold affine into (mul, add) rows: y = x*k + b with
        # k = inv*scale, b = bias - mean*inv*scale
        k = inv * sb_ref[0:1, :]
        acc_scr[2:3, :] = k
        acc_scr[3:4, :] = sb_ref[1:2, :] - mean * k

    @pl.when(phase == 1)
    def _normalize():
        xf = x_ref[0].astype(jnp.float32)
        y = xf * acc_scr[2:3, :] + acc_scr[3:4, :]
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "silu", "interpret"),
)
def full_group_norm(x, scale, bias, num_groups: int, eps: float = 1e-5,
                    silu: bool = False, interpret: bool = False):
    """Single-call GroupNorm(+SiLU): x [B, rows, C] -> same shape.
    Reads the activation twice and writes once (the bandwidth minimum for
    a two-pass normalization) with no XLA op boundaries in between."""
    B, rows, C = x.shape
    gsize = C // num_groups
    Cp = _round_up(C, _LANES)
    Gp = _round_up(num_groups, _LANES)
    block_rows = _pick_block_rows(rows)
    if block_rows is None:
        return reference_group_norm(x, scale, bias, num_groups, eps, silu)
    # wide-C tiles (up-block concat, C=2560): keep the fp32 working tile
    # under ~8MB so double-buffered in/out blocks fit scoped VMEM
    while (block_rows > 64 and block_rows % 2 == 0
           and block_rows * Cp * 4 > (8 << 20)):
        block_rows //= 2
    num_tiles = rows // block_rows

    gdown = np.zeros((Cp, Gp), np.float32)
    gup = np.zeros((Gp, Cp), np.float32)
    for ch in range(C):
        g = ch // gsize
        gdown[ch, g] = 1.0 / (rows * gsize)
        gup[g, ch] = 1.0
    sb = jnp.stack([
        jnp.pad(scale.astype(jnp.float32), (0, Cp - C)),
        jnp.pad(bias.astype(jnp.float32), (0, Cp - C))])

    kernel = functools.partial(_full_gn_kernel, c=C, eps=eps, silu=silu)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, rows, Cp), x.dtype),
        grid=(B, 2, num_tiles),
        in_specs=[
            pl.BlockSpec((1, block_rows, Cp), lambda b, p, t: (b, t, 0)),
            pl.BlockSpec((2, Cp), lambda b, p, t: (0, 0)),
            pl.BlockSpec((Cp, Gp), lambda b, p, t: (0, 0)),
            pl.BlockSpec((Gp, Cp), lambda b, p, t: (0, 0)),
        ],
        # phase 0 steps all map to output tile 0 (garbage, overwritten by
        # phase 1 t=0): an unchanging block index between steps elides the
        # per-tile copy-out, so the stats phase costs ~no write bandwidth
        out_specs=pl.BlockSpec((1, block_rows, Cp),
                               lambda b, p, t: (b, t * p, 0)),
        scratch_shapes=[pltpu.VMEM((4, Cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.pad(x, ((0, 0), (0, 0), (0, Cp - C))) if Cp != C else x,
      sb, jnp.asarray(gdown), jnp.asarray(gup))
    return out[:, :, :C]


def fused_group_norm(x, scale, bias, num_groups: int, eps: float = 1e-5,
                     silu: bool = False, interpret: bool = False):
    """x: [B, rows, C] -> [B, rows, C]; Pallas stats + XLA-fused
    normalize(+SiLU)."""
    mean, inv = group_norm_stats(x, num_groups, eps, interpret=interpret)
    y = (x.astype(jnp.float32) - mean[:, None, :]) * (
        inv[:, None, :] * scale.astype(jnp.float32)) + bias.astype(
        jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


# Minimum spatial rows for the Pallas stats path: measured in-graph on
# v5e, the kernel wins big on VAE-scale slabs (decode 1.54s -> 0.99s for
# 32 frames at 512p) but LOSES on UNet-scale ones (458 -> 484 ms/step:
# ~50us of per-call overhead x ~480 small GroupNorms per step outweighs
# the saved reduce).  128^2 spatial is the crossover region.
_MIN_PALLAS_ROWS = 16384
# Channel-width cap: a row tile is [<=1024, Cp] with an fp32 working copy
# (~6 bytes/elem), so very wide norms (e.g. the UNet's C=2560 skip-concat
# inputs — which are below the row threshold anyway) stay off the kernel
# rather than brushing the scoped-VMEM limit.
_MAX_PALLAS_CHANNELS = 1024


def _gn_mode() -> str:
    """GroupNorm dispatch mode: 'auto' (measured-best defaults), 'full'
    (force the single-call two-phase kernel wherever tileable), 'stats'
    (force the stats-only kernel), 'xla'."""
    import os

    if os.environ.get("VIDTOME_DISABLE_PALLAS_GN"):
        return "xla"
    return os.environ.get("VIDTOME_GN_MODE", "auto").lower()


# Minimum elements for the full (two-phase) kernel: below this the
# pallas call overhead outweighs any pass saved (mid-block 8x8 slabs).
_MIN_FULL_ELEMS = 1 << 18


def pallas_eligible(x, use_pallas: bool | None = None) -> bool:
    """Single source of truth for the kernel-vs-XLA dispatch (layers.py
    consults this too, so module selection and op dispatch cannot
    drift).  VIDTOME_DISABLE_PALLAS_GN=1 is the runtime escape hatch."""
    mode = _gn_mode()
    if mode == "xla":
        return False
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    rows = int(np.prod(x.shape[1:-1]))
    if not (bool(use_pallas) and rows % 8 == 0
            and _pick_block_rows(rows) is not None):
        return False
    if mode == "full":
        return rows * x.shape[-1] >= _MIN_FULL_ELEMS
    return (rows >= _MIN_PALLAS_ROWS
            and x.shape[-1] <= _MAX_PALLAS_CHANNELS)


def group_norm(x, scale, bias, num_groups: int, eps: float = 1e-5,
               silu: bool = False, use_pallas: bool | None = None):
    """Dispatch: Pallas statistics kernel on TPU for large spatial slabs
    (VAE encode/decode), XLA formula otherwise.  x: [B, ..., C]."""
    if not pallas_eligible(x, use_pallas):
        return reference_group_norm(x, scale, bias, num_groups, eps, silu)
    B, C = x.shape[0], x.shape[-1]
    rows = int(np.prod(x.shape[1:-1]))
    if _gn_mode() == "full":
        y = full_group_norm(x.reshape(B, rows, C), scale, bias, num_groups,
                            eps, silu)
    else:
        y = fused_group_norm(x.reshape(B, rows, C), scale, bias, num_groups,
                             eps, silu)
    return y.reshape(x.shape)
