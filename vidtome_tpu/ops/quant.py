"""Int8 (W8A8) quantized serving path for the UNet hot matmuls/convs.

The round-2 roofline (docs/DESIGN.md §8) proved the bf16 graph caps at
~2.9 frames/s even at 100% MFU; v5e executes s8 x s8 -> s32 at ~2x the
bf16 MXU rate (394 TOPS vs 197 TFLOP/s), so quantized serving is the one
lever that multiplies throughput instead of shaving overheads.  Role
equivalent in the reference: the fp16 serving path
(`/root/reference/utils/utils.py:42-66` — ``float_precision: fp16``);
this is the TPU-native next notch on the same speed/quality dial.

Scheme (established W8A8 diffusion practice):

  * weights — symmetric per-output-channel int8, quantized ONCE at model
    load (`quantize_params`); int8 weights also halve the per-call HBM
    weight traffic.
  * activations — symmetric dynamic int8: per-row (token) scales for
    matmuls, per-sample scales for convs.  Dynamic scales cost one extra
    elementwise pass but need no calibration data (zero-egress: there are
    no calibration clips to run), and per-row granularity absorbs the
    activation outliers that break static per-tensor schemes.
  * accumulation — int32 on the MXU; dequant (s_act * s_weight) and bias
    applied in fp32 on the way out, then cast back to bf16.

Policy lives entirely in `quantize_params` (which layers get int8);
the QDense/QConv modules in models/layers.py consume whatever the
"qparams" collection provides and fall back to the bf16 path otherwise,
so one model definition serves both modes.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quantize_weight(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel quantization.  ``w``: [K, N] (dense)
    or [kh, kw, Cin, Cout] (conv, HWIO) — the last axis is the output
    channel.  Returns (int8 weights, fp32 per-channel scale).  Pure jnp:
    runs on device (a numpy version would round-trip the full weight set
    through the host, ~1.7GB over a tunneled backend)."""
    wf = jnp.asarray(w).astype(jnp.float32)
    reduce_axes = tuple(range(wf.ndim - 1))
    amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=reduce_axes), _EPS)
    scale = amax / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_acts(x: jnp.ndarray, axes: tuple[int, ...]
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric activation quantization; ``axes`` are reduced to
    one scale (e.g. the feature axis for per-row).  Returns (int8, fp32
    scale broadcastable against x).

    The amax runs on the INPUT dtype: converting first made XLA
    materialize a shared fp32 copy of the whole activation between the
    reduce and the quantize (2x HBM traffic, measured in the int8 trace);
    bf16 |max| is order-exact and only the scalar scale needs fp32."""
    amax = jnp.max(jnp.abs(x), axis=axes,
                   keepdims=True).astype(jnp.float32)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127,
                 127).astype(jnp.int8)
    return q, scale


def int8_dense(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
               out_dtype: Any,
               act_scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """x: [..., K] bf16/fp32; w_q: [K, N] int8 -> [..., N] out_dtype.
    Per-row dynamic activation scales, or a precomputed scalar
    ``act_scale`` (post-norm inputs, see `static_act_scale`)."""
    if act_scale is None:
        q, s = quantize_acts(x, axes=(x.ndim - 1,))
    else:
        s = act_scale
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127,
                     127).astype(jnp.int8)
    y = jax.lax.dot_general(
        q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s * w_scale)).astype(out_dtype)


def int8_conv(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
              strides, padding, out_dtype: Any,
              act_scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """x: [B, H, W, Cin]; w_q: [kh, kw, Cin, Cout] int8 (HWIO).

    ``act_scale`` None: dynamic per-sample scales (every output pixel of
    sample b reads only sample b, so the scale factors out of the
    convolution).  Measured caveat on v5e: XLA's reduce-to-scalar over a
    whole NHWC slab runs at ~30GB/s, costing ~66ms/step across the UNet —
    so convs whose input range is known statically (post-GroupNorm, see
    `static_act_scale`) pass a precomputed scalar ``act_scale`` instead
    and the quantize fuses into the producer as pure elementwise."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w_q.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    if act_scale is None:
        q, s = quantize_acts(x, axes=(1, 2, 3))
    else:
        s = act_scale
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127,
                     127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        q, w_q, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s * w_scale)).astype(out_dtype)


# Static activation-scale calibration constant: post-GroupNorm activations
# are zero-mean unit-variance per group by construction; the expected max
# of ~1e6 normal samples is ~5.2 sigma, so amax ~= max_c(|beta_c| +
# K*|gamma_c|).  Values beyond the clip saturate to +-127 (rare, and mild
# clipping is benign for int8 quality).
_STATIC_K = 6.0
_STATIC_AMAX_FLOOR = 0.3  # shared with ops/resnet._act_q


def static_act_scale(norm_scale, norm_bias):
    """int8 scale for an activation that is GroupNorm(x)*gamma+beta
    (optionally followed by SiLU, which only shrinks the negative side):
    conservative amax from the affine parameters alone — no data pass."""
    amax = jnp.maximum(
        jnp.max(jnp.abs(norm_bias.astype(jnp.float32))
                + _STATIC_K * jnp.abs(norm_scale.astype(jnp.float32))),
        _STATIC_AMAX_FLOOR)
    return amax / 127.0


# ----------------------------------------------------------------------
# Parameter-tree transform

# Layers kept in bf16 by default:
#   * embeddings and per-call-tiny projections (M=8 rows — MXU-underfilled,
#     nothing to win);
#   * the latent-facing conv_in and eps-producing conv_out (output-quality
#     critical, negligible compute);
#   * the GEGLU down-projection ff/proj_out — measured on v5e, quantizing
#     it COSTS ~50ms/step: its activation input is the wide hidden
#     (h*gelu(gate), 2560-5120 lanes), so the dynamic amax + quantize adds
#     three full passes over an 84-167MB tensor per block, swamping the 2x
#     MXU win;
#   * every layer whose input is NOT a norm output and therefore needs a
#     dynamic per-sample amax — Transformer2D proj_out, Down/Upsample
#     convs, resnet shortcuts: measured on v5e, XLA's whole-slab
#     reduce-to-scalar runs at ~30GB/s (0.3-0.8ms per instance, ~60ms/
#     step total) while the int8 win on these modest 1x1/3x3 convs is
#     <0.1ms each.
# What quantizes: attention q/k/v(/out), GEGLU up-projection, transformer
# proj_in, resnet conv1/conv2 — the FLOP mass, all with static or cheap
# per-row activation scales.
DEFAULT_EXCLUDE = (
    r"time_embedding|add_embedding|time_emb_proj|"
    r"(^|/)conv_in(/|$)|(^|/)conv_out(/|$)|(^|/)ff/proj_out(/|$)|"
    r"attentions_\d+/proj_out|mid_attentions_\d+/proj_out|"
    r"downsample|upsample|conv_shortcut"
)


def quantize_params(params, exclude: str | None = DEFAULT_EXCLUDE,
                    include: str | None = None):
    """Split a bf16 parameter tree into (residual params, qparams).

    Walks the nested dict; every "kernel" leaf of ndim 2/4 whose path does
    not match ``exclude`` (and matches ``include`` if given) moves into
    the qparams tree as {kernel_q: int8, scale: fp32[out]} and is REMOVED
    from the params copy (the QDense/QConv bf16 branch never requests it,
    and keeping both trees resident would waste ~1.7GB HBM).  Biases and
    norms stay in params."""
    ex = re.compile(exclude) if exclude else None
    inc = re.compile(include) if include else None
    to_quant: dict = {}
    # Modules whose input activation is a sibling GROUPNORM's output (the
    # architecture guarantees the pairing): resnet convs read
    # silu(normN(x)), the transformer projection reads norm(x).  Their
    # int8 activation scale is computed statically from the norm affine
    # (static_act_scale) instead of a measured per-call amax — this is
    # what avoids the ~30GB/s whole-slab reduce the conv path would
    # otherwise need.
    #
    # LAYERNORM-fed matmuls (attn1/attn2 q/k/v, GEGLU proj_in) stay
    # DYNAMIC per-row: LN normalizes over only C channels, so a single
    # outlier channel can legally reach ~sqrt(C)*|gamma| (18-36 sigma at
    # C=320-1280) — real SD checkpoints are known to have such outlier
    # channels (the classic W8A8 failure mode), and the 6-sigma Gaussian
    # bound would clip them hard.  Per-row amax over the feature axis
    # fuses into the producer for matmul inputs (unlike the conv slab
    # reduce), so the dynamic scale is cheap where it is needed.
    # attn2's k/v read the TEXT context (not normed here): also dynamic.
    static_rules = {
        "conv1": ("norm1", (None,)),
        "conv2": ("norm2", (None,)),
        "proj_in": ("norm", (None,)),
    }
    act_norms: dict[tuple, tuple] = {}

    def walk(node, qnode, path_t):
        out = {}
        for k, v in node.items():
            pt = path_t + (k,)
            p = "/".join(pt)
            if isinstance(v, dict):
                sub_q: dict = {}
                sub = walk(v, sub_q, pt)
                if sub:
                    out[k] = sub
                if sub_q:
                    qnode[k] = sub_q
            elif (k == "kernel" and hasattr(v, "ndim")
                  and v.ndim in (2, 4)
                  and (ex is None or not ex.search(p))
                  and (inc is None or inc.search(p))):
                qnode[k] = v
            else:
                out[k] = v
        for mod, (normname, subs) in static_rules.items():
            if (mod not in qnode
                    or not isinstance(node.get(normname), dict)
                    or "scale" not in node[normname]):
                continue
            norm = node[normname]
            for s in subs:
                tgt = qnode[mod] if s is None else qnode[mod].get(s)
                if isinstance(tgt, dict) and "kernel" in tgt:
                    act_norms[path_t + (mod,) + (() if s is None
                                                 else (s,))] = (
                        norm["scale"], norm["bias"])
        return out

    residual = walk(dict(params), to_quant, ())
    # numeric work in ONE jitted dispatch over the selected subtree
    # (per-leaf eager quantization would be hundreds of round trips on a
    # tunneled backend)
    pairs = jax.jit(
        lambda t: jax.tree.map(quantize_weight, t))(to_quant)

    def expand(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = expand(v)
            else:  # (kernel_q, scale) pair at a "kernel" key
                out["kernel_q"], out["scale"] = v
        return out

    qparams = expand(pairs)
    if act_norms:
        keys = list(act_norms)
        scalars = jax.jit(lambda t: tuple(
            static_act_scale(s, b) for s, b in t))(
            tuple(act_norms[k] for k in keys))
        for pt, sc in zip(keys, scalars):
            n = qparams
            for k in pt:
                n = n[k]
            n["act_scale"] = sc
    return residual, qparams


def count_quantized(qparams) -> int:
    return sum(1 for leaf in jax.tree.leaves(qparams)
               if leaf.dtype == jnp.int8)
