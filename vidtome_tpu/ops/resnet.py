"""Fused ResnetBlock2D Pallas kernels (round-3 bandwidth escalation).

The UNet resnet block — GN1+SiLU -> conv3x3 -> +temb -> GN2+SiLU ->
conv3x3 -> +shortcut (`models/layers.ResnetBlock2D`, mirroring the
reference's diffusers ResnetBlock2D) — executes in XLA as ~8-10 separate
ops per block whose cost at UNet scales is dominated by op-boundary
structure rather than FLOPs (measured, DESIGN.md §8.1/§8.3).  These
kernels collapse the whole block into TWO pallas calls:

  call A: GN1 statistics -> normalize+SiLU -> conv1 (9 shifted MXU dots
          per input-channel chunk) -> +bias+temb -> GN2 statistics,
          with the conv accumulator held in fp32 VMEM scratch;
  call B: normalize+SiLU -> conv2 -> +shortcut -> +bias, writing the
          block output.  The shortcut arrives pre-computed: identity
          shapes pass x; projection shapes run the 1x1 conv as one XLA
          matmul outside the kernel (round-5 fix — the in-kernel
          per-chunk shortcut dots serialized into the conv2 phase and
          lost 0.94x/0.68x on projection shapes).

The 3x3 convolution runs as 9 shifted [H*W, 128] x [128, Cout] MXU dots
per 128-lane input chunk — channels are chunked so whole-frame spatial
tiles fit VMEM (~16MB/core) at SD's level-0 shapes ([*, 64, 64,
320/640]).  Grid order per batch element: phases are sequential
("arbitrary"), batch is "parallel".

Numerical contract: all normalization statistics and conv accumulation
in fp32, activations bf16 in/out — matching the XLA path's effective
precision (fp32 GN, bf16 convs with fp32 accumulation) to ~1e-2 rel.

Dispatch safety: `fused_resnet` is shape-generic over H, W (H*W must be
a sublane multiple), Cin/Cout (padded to the 128-lane boundary
internally); the wiring in models/layers.py gates it to the eligible
level-0 shapes where it wins (config key generation.resnet_mode / inversion.resnet_mode, DESIGN.md §8.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _group_mats(C: int, Cp: int, num_groups: int, count: int):
    """Collapse/broadcast matrices turning masked channel sums into
    per-channel group means: gdown [Cp, Gp] (with the 1/count fold),
    gup [Gp, Cp]."""
    Gp = _round_up(num_groups, _LANES)
    gsize = C // num_groups
    gdown = np.zeros((Cp, Gp), np.float32)
    gup = np.zeros((Gp, Cp), np.float32)
    for ch in range(C):
        g = ch // gsize
        gdown[ch, g] = 1.0 / (count * gsize)
        gup[g, ch] = 1.0
    return jnp.asarray(gdown), jnp.asarray(gup)


def _pack_w(w, Cp: int, Op: int, dtype=jnp.bfloat16):
    """[3, 3, Cin, Cout] -> [Cp, 9, Op]: per-tap weight matrices laid out
    so one 128-lane input chunk is a contiguous block."""
    kh, kw, Ci, Co = w.shape
    w = jnp.pad(w.astype(dtype),
                ((0, 0), (0, 0), (0, Cp - Ci), (0, Op - Co)))
    return w.reshape(kh * kw, Cp, Op).transpose(1, 0, 2)


def _affine_from_stats(sums, sb, gdown, gup, eps):
    """sums [2, Cp] (masked channel sum / sumsq) -> (k, b) rows [2, Cp]
    with y = x*k + b the normalized-affine transform."""
    g = jax.lax.dot(sums, gdown, preferred_element_type=jnp.float32)
    m = jax.lax.dot(g, gup, preferred_element_type=jnp.float32)
    mean = m[0:1, :]
    var = jnp.maximum(m[1:2, :] - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    k = inv * sb[0:1, :]
    return k, sb[1:2, :] - mean * k


def _norm_silu(x3, k, b):
    """x3 [H, W, 128] chunk -> bf16 silu(x*k + b)."""
    y = x3.astype(jnp.float32) * k.reshape(1, 1, -1) + b.reshape(1, 1, -1)
    y = y * jax.nn.sigmoid(y)
    return y.astype(jnp.bfloat16)


def _conv_taps(y, w_ref, acc, H: int, W: int, dequant=None):
    """Accumulate the 9 shifted-window dots of one input chunk.
    y [H, W, 128] (bf16 activations, or int8 with ``dequant`` the
    per-output-channel fp32 row applied to each s32 tap result);
    w_ref [128, 9, Op]."""
    yp = jnp.pad(y, ((1, 1), (1, 1), (0, 0)))
    for i in range(9):
        dr, dc = divmod(i, 3)
        win = jax.lax.slice(yp, (dr, dc, 0), (dr + H, dc + W, yp.shape[2]))
        if dequant is None:
            acc[...] += jax.lax.dot(
                win.reshape(H * W, -1), w_ref[:, i, :],
                preferred_element_type=jnp.float32)
        else:
            r = jax.lax.dot(win.reshape(H * W, -1), w_ref[:, i, :],
                            preferred_element_type=jnp.int32)
            acc[...] += r.astype(jnp.float32) * dequant


def _act_q(y, sb, c: int):
    """Quantize a normalized+SiLU bf16 chunk with the static post-norm
    scale (the in-kernel restatement of ops/quant.static_act_scale:
    amax = max(|beta| + K|gamma|) over real channels, clamped — the
    constants are imported so the two paths cannot drift)."""
    from vidtome_tpu.ops.quant import _STATIC_AMAX_FLOOR, _STATIC_K

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, sb.shape[1]), 1)
    a = jnp.abs(sb[1:2, :]) + _STATIC_K * jnp.abs(sb[0:1, :])
    amax = jnp.maximum(jnp.max(jnp.where(lane < c, a, 0.0)),
                       _STATIC_AMAX_FLOOR)
    sx = amax / 127.0
    q = jnp.clip(jnp.round(y.astype(jnp.float32) * (1.0 / sx)),
                 -127, 127).astype(jnp.int8)
    return q, sx


def _kernel_a(x_ref, sb1_ref, g1d_ref, g1u_ref, w1_ref, sw1_ref, tb1_ref,
              h_ref, st2_ref, acc, s1, aff1, *,
              c_in: int, H: int, W: int, KC: int, MT: int, MR: int,
              eps: float, quant: bool):
    p = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when((p == 0) & (t < KC))
    def _stats1():
        xf = x_ref[0].astype(jnp.float32).reshape(H * W, _LANES)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        xm = jnp.where(lane + t * _LANES < c_in, xf, 0.0)
        sl = pl.ds(t * _LANES, _LANES)
        s1[0:1, sl] = jnp.sum(xm, axis=0, keepdims=True)
        s1[1:2, sl] = jnp.sum(xm * xm, axis=0, keepdims=True)

    @pl.when((p == 1) & (t == 0))
    def _finish_stats1():
        k, b = _affine_from_stats(s1[...], sb1_ref[...], g1d_ref[...],
                                  g1u_ref[...], eps)
        aff1[0:1, :] = k
        aff1[1:2, :] = b
        acc[...] = jnp.zeros_like(acc)

    @pl.when((p == 1) & (t < KC))
    def _conv1():
        sl = pl.ds(t * _LANES, _LANES)
        y = _norm_silu(x_ref[0], aff1[0:1, sl][0], aff1[1:2, sl][0])
        if quant:
            qy, sx = _act_q(y, sb1_ref[...], c_in)
            _conv_taps(qy, w1_ref, acc, H, W, dequant=sx * sw1_ref[...])
        else:
            _conv_taps(y, w1_ref, acc, H, W)

    @pl.when((p == 1) & (t == KC - 1))
    def _epilogue():
        h = acc[...] + tb1_ref[0]  # +conv bias +temb (padded lanes: 0)
        acc[...] = h
        st2_ref[0, 0:1, :] = jnp.sum(h, axis=0, keepdims=True)
        st2_ref[0, 1:2, :] = jnp.sum(h * h, axis=0, keepdims=True)

    @pl.when(p == 2)
    def _write():
        rows = pl.ds(jnp.minimum(t, MT - 1) * MR * W, MR * W)
        h_ref[0] = acc[rows, :].reshape(MR, W, -1).astype(h_ref.dtype)


def _kernel_b(h_in_ref, st2_ref, sb2_ref, g2d_ref, g2u_ref, w2_ref,
              sw2_ref, b2_ref, sc_ref, o_ref, acc, aff2, *,
              c_mid: int, H: int, W: int, KC2: int, MT: int,
              MR: int, eps: float, quant: bool):
    """conv2 phase + shortcut add.  The shortcut tensor `sc_ref` arrives
    PRE-COMPUTED: identity shapes pass x itself; projection shapes pass
    the 1x1-conv result computed by XLA outside the kernel (a dense
    [B*H*W, Ci] x [Ci, Co] matmul XLA runs near MXU peak — the previous
    in-kernel per-chunk shortcut dots serialized into the conv2 phase
    and measured 0.94x/0.68x vs XLA on the projection shapes,
    DESIGN §8.4)."""
    p = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when((p == 0) & (t == 0))
    def _finish_stats2():
        k, b = _affine_from_stats(st2_ref[0], sb2_ref[...], g2d_ref[...],
                                  g2u_ref[...], eps)
        aff2[0:1, :] = k
        aff2[1:2, :] = b
        acc[...] = jnp.zeros_like(acc)

    @pl.when((p == 0) & (t < KC2))
    def _conv2():
        sl = pl.ds(t * _LANES, _LANES)
        y = _norm_silu(h_in_ref[0], aff2[0:1, sl][0], aff2[1:2, sl][0])
        if quant:
            qy, sx = _act_q(y, sb2_ref[...], c_mid)
            _conv_taps(qy, w2_ref, acc, H, W, dequant=sx * sw2_ref[...])
        else:
            _conv_taps(y, w2_ref, acc, H, W)

    @pl.when(p == 1)
    def _write():
        mt = jnp.minimum(t, MT - 1)
        rows = pl.ds(mt * MR * W, MR * W)
        out = (acc[rows, :] + b2_ref[...]
               + sc_ref[0].reshape(MR * W, -1).astype(jnp.float32))
        o_ref[0] = out.reshape(MR, W, -1).astype(o_ref.dtype)


def _pick_mr(H: int, W: int, Op: int) -> int:
    """Output m-tile rows: largest divisor of H keeping a tile <= ~1MB."""
    for mr in (32, 16, 8, 4, 2, 1):
        if H % mr == 0 and mr * W * Op * 2 <= (1 << 20):
            return mr
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "interpret", "quant"),
)
def fused_resnet(x, tvec, n1_scale, n1_bias, w1, b1, n2_scale, n2_bias,
                 w2, b2, ws=None, bs=None, w1_scale=None, w2_scale=None,
                 *, num_groups: int = 32, eps: float = 1e-5,
                 interpret: bool = False, quant: bool = False):
    """Fused resnet block.  x [B, H, W, Cin] bf16; tvec [B, Cout] is the
    time_emb_proj output.  Returns [B, H, W, Cout] bf16:
      shortcut(x) + conv2(silu(gn2(conv1(silu(gn1(x))) + b1 + tvec)))
    with shortcut = identity (Cin == Cout, ws None) or 1x1 conv (ws
    [Cin, Cout] + bs).  Reference semantics: ResnetBlock2D in
    models/layers.py (diffusers resnet.py:ResnetBlock2D).

    ``quant=True`` is the W8A8 serving variant: w1/w2 are pre-quantized
    int8 (per-output-channel scales w1_scale/w2_scale, ops/quant
    layout), activations quantize in-kernel with the static post-norm
    scale, taps run s8 x s8 -> s32 on the MXU (~2x bf16 rate on v5e);
    the shortcut stays bf16 per the §8.2 exclusion policy."""
    B, H, W, Ci = x.shape
    Co = w1.shape[-1]
    assert w1.shape == (3, 3, Ci, Co) and w2.shape == (3, 3, Co, Co)
    assert (ws is None) == (Ci == Co)
    assert (w1_scale is not None and w2_scale is not None) if quant \
        else True, "quant=True needs per-channel weight scales"
    Cp = _round_up(Ci, _LANES)
    Op = _round_up(Co, _LANES)
    KC = Cp // _LANES
    KC2 = Op // _LANES
    MR = _pick_mr(H, W, Op)
    MT = H // MR
    f32 = jnp.float32

    def _clamp_groups(C: int) -> int:
        g = num_groups
        while C % g:
            g //= 2
        return g

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cp - Ci)))
    g1d, g1u = _group_mats(Ci, Cp, _clamp_groups(Ci), H * W)
    g2d, g2u = _group_mats(Co, Op, _clamp_groups(Co), H * W)
    sb1 = jnp.stack([jnp.pad(n1_scale.astype(f32), (0, Cp - Ci)),
                     jnp.pad(n1_bias.astype(f32), (0, Cp - Ci))])
    sb2 = jnp.stack([jnp.pad(n2_scale.astype(f32), (0, Op - Co)),
                     jnp.pad(n2_bias.astype(f32), (0, Op - Co))])
    wdt = jnp.int8 if quant else jnp.bfloat16
    w1p = _pack_w(w1, Cp, Op, wdt)
    w2p = _pack_w(w2, Op, Op, wdt)
    if quant:
        sw1 = jnp.pad(w1_scale.astype(f32), (0, Op - Co)).reshape(1, Op)
        sw2 = jnp.pad(w2_scale.astype(f32), (0, Op - Co)).reshape(1, Op)
    else:
        sw1 = sw2 = jnp.ones((1, Op), f32)
    tb1 = (tvec.astype(f32) + b1.astype(f32)[None, :])
    # [B, 1, Op]: a (1, Op) block on a [B, Op] array violates the TPU
    # sublane rule (second-to-last block dim must divide 8 or equal the
    # array dim); the singleton middle axis makes the block exact.
    tb1 = jnp.pad(tb1, ((0, 0), (0, Op - Co)))[:, None, :]

    Ta = max(KC, MT)
    const = lambda b, p, t: (0, 0)  # noqa: E731
    kernel_a = functools.partial(
        _kernel_a, c_in=Ci, H=H, W=W, KC=KC, MT=MT, MR=MR, eps=eps,
        quant=quant)
    h, st2 = pl.pallas_call(
        kernel_a,
        out_shape=(jax.ShapeDtypeStruct((B, H, W, Op), jnp.bfloat16),
                   jax.ShapeDtypeStruct((B, 2, Op), f32)),
        grid=(B, 3, Ta),
        in_specs=[
            pl.BlockSpec(
                (1, H, W, _LANES),
                lambda b, p, t: (b, 0, 0,
                                 jnp.where(p < 2, jnp.minimum(t, KC - 1),
                                           0))),
            pl.BlockSpec((2, Cp), const),
            pl.BlockSpec((Cp, g1d.shape[1]), const),
            pl.BlockSpec((g1u.shape[0], Cp), const),
            pl.BlockSpec((_LANES, 9, Op),
                         lambda b, p, t: (jnp.minimum(t, KC - 1), 0, 0)),
            pl.BlockSpec((1, Op), const),
            pl.BlockSpec((1, 1, Op), lambda b, p, t: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, MR, W, Op),
                lambda b, p, t: (b, jnp.where(p == 2,
                                              jnp.minimum(t, MT - 1), 0),
                                 0, 0)),
            pl.BlockSpec((1, 2, Op), lambda b, p, t: (b, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((H * W, Op), f32),
            pltpu.VMEM((2, Cp), f32),
            pltpu.VMEM((2, Cp), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, sb1, g1d, g1u, w1p, sw1, tb1)

    proj = ws is not None
    b2p = jnp.pad(b2.astype(f32), (0, Op - Co)).reshape(1, Op)

    # Shortcut tensor, computed OUTSIDE the kernel: identity shapes pass
    # x itself (Cp == Op); projection shapes run the 1x1 conv as one XLA
    # matmul (near MXU peak; the old in-kernel per-chunk dots serialized
    # into the conv2 phase and lost 0.94x/0.68x on the proj shapes).
    # bs folds into the shortcut so the write phase stays one add.
    if proj:
        sc = jnp.dot(x.astype(jnp.bfloat16), ws.astype(jnp.bfloat16),
                     preferred_element_type=f32)
        if bs is not None:
            sc = sc + bs.astype(f32)
        scp = jnp.pad(sc.astype(jnp.bfloat16),
                      ((0, 0), (0, 0), (0, 0), (0, Op - Co)))
    else:
        scp = xp  # Cp == Op
    # shortcut re-read in output m-tiles at the write phase
    sc_spec = pl.BlockSpec(
        (1, MR, W, Op),
        lambda b, p, t: (b, jnp.where(p == 1, jnp.minimum(t, MT - 1),
                                      0), 0, 0))

    Tb = max(KC2, MT)
    kernel_b = functools.partial(
        _kernel_b, c_mid=Co, H=H, W=W, KC2=KC2, MT=MT, MR=MR,
        eps=eps, quant=quant)

    out = pl.pallas_call(
        kernel_b,
        out_shape=jax.ShapeDtypeStruct((B, H, W, Op), jnp.bfloat16),
        grid=(B, 2, Tb),
        in_specs=[
            pl.BlockSpec(
                (1, H, W, _LANES),
                lambda b, p, t: (b, 0, 0,
                                 jnp.where(p == 0, jnp.minimum(t, KC2 - 1),
                                           0))),
            pl.BlockSpec((1, 2, Op), lambda b, p, t: (b, 0, 0)),
            pl.BlockSpec((2, Op), const),
            pl.BlockSpec((Op, g2d.shape[1]), const),
            pl.BlockSpec((g2u.shape[0], Op), const),
            pl.BlockSpec((_LANES, 9, Op),
                         lambda b, p, t: (jnp.minimum(t, KC2 - 1), 0, 0)),
            pl.BlockSpec((1, Op), const),
            pl.BlockSpec((1, Op), const),
            sc_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, MR, W, Op),
            lambda b, p, t: (b, jnp.where(p == 1, jnp.minimum(t, MT - 1),
                                          0), 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((H * W, Op), f32),
            pltpu.VMEM((2, Op), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(h, st2, sb2, g2d, g2u, w2p, sw2, b2p, scp)
    return out[..., :Co]
