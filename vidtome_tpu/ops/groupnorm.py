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
        inv = jax.lax.rsqrt(m[1:2, :] - mean * mean + eps)
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

    block_rows = rows
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8):
        if rows % cand == 0:
            block_rows = cand
            break
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


def pallas_eligible(x, use_pallas: bool | None = None) -> bool:
    """Single source of truth for the kernel-vs-XLA dispatch (layers.py
    consults this too, so module selection and op dispatch cannot
    drift).  VIDTOME_DISABLE_PALLAS_GN=1 is the runtime escape hatch."""
    import os

    if os.environ.get("VIDTOME_DISABLE_PALLAS_GN"):
        return False
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    rows = int(np.prod(x.shape[1:-1]))
    return (bool(use_pallas) and rows % 8 == 0
            and rows >= _MIN_PALLAS_ROWS
            and x.shape[-1] <= _MAX_PALLAS_CHANNELS)


def group_norm(x, scale, bias, num_groups: int, eps: float = 1e-5,
               silu: bool = False, use_pallas: bool | None = None):
    """Dispatch: Pallas statistics kernel on TPU for large spatial slabs
    (VAE encode/decode), XLA formula otherwise.  x: [B, ..., C]."""
    if not pallas_eligible(x, use_pallas):
        return reference_group_norm(x, scale, bias, num_groups, eps, silu)
    B, C = x.shape[0], x.shape[-1]
    rows = int(np.prod(x.shape[1:-1]))
    y = fused_group_norm(x.reshape(B, rows, C), scale, bias, num_groups,
                         eps, silu)
    return y.reshape(x.shape)
