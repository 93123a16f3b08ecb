"""Fused transformer cross-attention sublayer for TPU (Pallas).

The serve-loop ceiling analysis (DESIGN §9.3, perf/trace_maxe3xb_r5.json)
shows the remaining full-step wall is HBM-bound norm-stat / residual /
eltwise traffic spread across many small op instances — at UNet scales
the cost is the op-boundary structure, not any single reduce (§8.1/§8.3
negative results).  The fused-resnet escalation (§8.4) won by owning a
WHOLE block; this kernel applies the same move to the transformer
block's cross-attention chain.  One pallas call per block computes

    h  = x + a1                    (attn1 residual add)
    y2 = LayerNorm(h; g2, b2)      (norm2)
    q  = y2 @ wq                   (to_q; softmax scale pre-folded)
    a  = softmax_per_head(q k^T) v (cross-attention, tiny KV: 77 tokens)
    o  = a @ wout + bout           (to_out)
    x3 = h + o                     (attn2 residual add)
    y3 = LayerNorm(x3; g3, b3)     (norm3)

and emits (x3, y3) — replacing ~10 XLA op instances (2 residual adds,
2 LayerNorm reduce+normalize pairs, 2 projections, attention) per
transformer block with one kernel that reads x/a1 once and writes
x3/y3 once.  K and V come precomputed from the 77-token text context
(two tiny XLA matmuls per call — not worth fusing).

Head handling at SD1.5's hostile D=40 (not lane-aligned): per-head
scores use CHANNEL-MASKED full-C contractions — s_h = q @ (k ⊙ mask_h)^T
sums only head h's channels, so no 40-lane VMEM slicing/relayout ever
happens.  This burns heads× the minimal score FLOPs, but the score
matmuls are tiny ([bm, C] x [Skv_p, C] with Skv_p = 128) and the kernel
is bandwidth-, not FLOP-, bound.

The reference runs this chain as separate torch module calls
(diffusers BasicTransformerBlock; reference relies on xformers only for
the attention core) — no counterpart kernel exists there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import math

_LANES = 128
_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
_LOG2E = math.log2(math.e)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def reference_cross_sublayer(x, a1, k, v, wq, wout, bout, g2, b2, g3, b3,
                             heads: int, kv_len: int, eps: float = 1e-5):
    """jnp oracle with the exact same contract as the kernel.
    x, a1: [B, S, C]; k, v: [B, Skv, C] (only kv_len rows valid);
    wq/wout: [C, C] (softmax scale NOT folded — applied here)."""
    B, S, C = x.shape
    D = C // heads
    h = x + a1
    hf = h.astype(jnp.float32)
    mu = hf.mean(-1, keepdims=True)
    var = jnp.maximum((hf * hf).mean(-1, keepdims=True) - mu * mu, 0.0)
    y2 = ((hf - mu) * jax.lax.rsqrt(var + eps) * g2 + b2).astype(x.dtype)
    q = jnp.dot(y2, wq.astype(x.dtype))
    qh = q.reshape(B, S, heads, D).transpose(0, 2, 1, 3)
    kh = k[:, :kv_len].reshape(B, kv_len, heads, D).transpose(0, 2, 1, 3)
    vh = v[:, :kv_len].reshape(B, kv_len, heads, D).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) / math.sqrt(D)
    p = jax.nn.softmax(s, axis=-1)
    att = jnp.einsum("bhqk,bhkd->bhqd", p.astype(x.dtype), vh)
    att = att.transpose(0, 2, 1, 3).reshape(B, S, C)
    o = jnp.dot(att, wout.astype(x.dtype)) + bout.astype(x.dtype)
    x3 = h + o
    xf = x3.astype(jnp.float32)
    mu3 = xf.mean(-1, keepdims=True)
    var3 = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu3 * mu3, 0.0)
    y3 = ((xf - mu3) * jax.lax.rsqrt(var3 + eps) * g3 + b3).astype(x.dtype)
    return x3, y3


def _ln(hf, scale, bias, c: int, cp: int, eps: float):
    """Row LayerNorm over the first ``c`` of ``cp`` lanes (fp32 stats;
    padded lanes contribute zero and stay zero)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)
    lmask = lane < c
    hm = jnp.where(lmask, hf, 0.0)
    mu = jnp.sum(hm, axis=1, keepdims=True) * (1.0 / c)
    var = jnp.maximum(
        jnp.sum(hm * hm, axis=1, keepdims=True) * (1.0 / c) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = (hf - mu) * inv * scale + bias
    return jnp.where(lmask, y, 0.0)


def _sublayer_kernel(x_ref, a1_ref, k_ref, v_ref, wq_ref, wout_ref,
                     sb_ref, x3_ref, y3_ref, *, c: int, heads: int,
                     kv_len: int, eps: float):
    cp = x_ref.shape[-1]
    skv = k_ref.shape[1]
    d = c // heads

    h = x_ref[0].astype(jnp.float32) + a1_ref[0].astype(jnp.float32)
    y2 = _ln(h, sb_ref[0:1, :], sb_ref[1:2, :], c, cp, eps)
    # to_q (softmax scale * log2(e) pre-folded into wq by the caller)
    q = jax.lax.dot(y2.astype(jnp.bfloat16), wq_ref[...],
                    preferred_element_type=jnp.float32)
    q = q.astype(jnp.bfloat16)

    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, skv), 1)
    kv_mask = kcol < kv_len  # [1, skv]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)
    att = jnp.zeros((x_ref.shape[1], cp), jnp.float32)
    k_all = k_ref[0]
    v_all = v_ref[0]
    for hd in range(heads):
        hmask = (lane >= hd * d) & (lane < (hd + 1) * d)  # [1, cp]
        kh = jnp.where(hmask, k_all, 0)
        # per-head scores via channel-masked full-C contraction: no
        # 40-lane slicing, the mask kills every other head's channels
        s = jax.lax.dot_general(
            q, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bm, skv]
        s = jnp.where(kv_mask, s, _NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)  # scores already carry log2(e) via wq
        l = jnp.sum(p, axis=1, keepdims=True)
        p = p * (1.0 / jnp.maximum(l, 1e-30))
        vh = jnp.where(hmask, v_all, 0)
        att += jax.lax.dot(p.astype(jnp.bfloat16), vh,
                           preferred_element_type=jnp.float32)
    o = jax.lax.dot(att.astype(jnp.bfloat16), wout_ref[...],
                    preferred_element_type=jnp.float32)
    x3 = h + o + sb_ref[4:5, :]
    x3_ref[0] = x3.astype(x3_ref.dtype)
    # norm3 runs on the bf16-rounded residual state (like the unfused
    # path, whose LayerNorm consumes the stored bf16 activation)
    x3f = x3_ref[0].astype(jnp.float32)
    y3_ref[0] = _ln(x3f, sb_ref[2:3, :], sb_ref[3:4, :], c, cp,
                    eps).astype(y3_ref.dtype)


def _pick_block_rows(sp: int, cp: int) -> int:
    """Largest row tile from the ladder that divides Sp and keeps the
    whole scoped-VMEM stack safe: double-buffered in/out tiles (4 tensors
    x 2 buffers x bm*cp bf16) + the resident weights (2 x cp^2 bf16) +
    ~4 fp32 locals (h/y2/q/att) must stay well under the 16MB limit —
    the 4MB fp32-locals budget here lands the C=1280 stack at ~12MB
    (the fused-resnet SDXL OOM lesson, models/layers._fused_ok)."""
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if sp % cand == 0 and cand * cp * 4 * 4 <= (4 << 20):
            return cand
    return 8


@functools.partial(
    jax.jit,
    static_argnames=("heads", "kv_len", "eps", "interpret"),
)
def fused_cross_sublayer(x, a1, k, v, wq, wout, bout, g2, b2, g3, b3,
                         heads: int, kv_len: int, eps: float = 1e-5,
                         interpret: bool = False):
    """x, a1: [B, S, C] bf16; k, v: [B, Skv, C] (kv_len valid rows);
    wq/wout [C, C], bout [C]; g/b LayerNorm affines [C].
    Returns (x3, y3) each [B, S, C] in x.dtype.  See module docstring."""
    B, S, C = x.shape
    D = C // heads
    assert heads * D == C, (heads, C)
    Cp = _round_up(C, _LANES)
    Skv_p = _round_up(k.shape[1], _LANES)
    bm = _pick_block_rows(_round_up(S, 8), Cp)
    Sp = _round_up(S, bm)

    xp = jnp.pad(x, ((0, 0), (0, Sp - S), (0, Cp - C)))
    ap = jnp.pad(a1, ((0, 0), (0, Sp - S), (0, Cp - C)))
    kp = jnp.pad(k, ((0, 0), (0, Skv_p - k.shape[1]), (0, Cp - C))
                 ).astype(jnp.bfloat16)
    vp = jnp.pad(v, ((0, 0), (0, Skv_p - v.shape[1]), (0, Cp - C))
                 ).astype(jnp.bfloat16)
    scale = (1.0 / math.sqrt(D)) * _LOG2E
    wqp = jnp.pad((wq.astype(jnp.float32) * scale).astype(jnp.bfloat16),
                  ((0, Cp - C), (0, Cp - C)))
    woutp = jnp.pad(wout.astype(jnp.bfloat16),
                    ((0, Cp - C), (0, Cp - C)))
    sb = jnp.stack([
        jnp.pad(g2.astype(jnp.float32), (0, Cp - C)),
        jnp.pad(b2.astype(jnp.float32), (0, Cp - C)),
        jnp.pad(g3.astype(jnp.float32), (0, Cp - C)),
        jnp.pad(b3.astype(jnp.float32), (0, Cp - C)),
        jnp.pad(bout.astype(jnp.float32), (0, Cp - C)),
    ])

    kernel = functools.partial(_sublayer_kernel, c=C, heads=heads,
                               kv_len=kv_len, eps=eps)
    x3, y3 = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, Sp, Cp), x.dtype),
                   jax.ShapeDtypeStruct((B, Sp, Cp), x.dtype)),
        grid=(B, Sp // bm),
        in_specs=[
            pl.BlockSpec((1, bm, Cp), lambda b, m: (b, m, 0)),
            pl.BlockSpec((1, bm, Cp), lambda b, m: (b, m, 0)),
            pl.BlockSpec((1, Skv_p, Cp), lambda b, m: (b, 0, 0)),
            pl.BlockSpec((1, Skv_p, Cp), lambda b, m: (b, 0, 0)),
            pl.BlockSpec((Cp, Cp), lambda b, m: (0, 0)),
            pl.BlockSpec((Cp, Cp), lambda b, m: (0, 0)),
            pl.BlockSpec((5, Cp), lambda b, m: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, bm, Cp), lambda b, m: (b, m, 0)),
                   pl.BlockSpec((1, bm, Cp), lambda b, m: (b, m, 0))),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xp, ap, kp, vp, wqp, woutp, sb)
    return x3[:, :S, :C], y3[:, :S, :C]
