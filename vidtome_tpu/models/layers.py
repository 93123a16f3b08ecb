"""Flax building blocks for the Stable Diffusion model family.

Owned implementation of the layer zoo the reference delegates to HuggingFace
diffusers (SURVEY.md L5): resnet blocks, spatial transformers with
cross-attention, GEGLU feed-forward, up/down samplers, timestep embeddings —
in NHWC (TPU-native conv layout), bf16 compute with fp32 norms, and with
cross-frame token merging (ToMe) and PnP injection integrated as
first-class block features instead of monkey-patches.

Weight-layout compatibility: parameter names/shapes are chosen so a
converter can map diffusers torch checkpoints (OIHW conv kernels -> HWIO,
linear weights transposed); see models/convert.py.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from flax.linen import dtypes as nn_dtypes

from vidtome_tpu.core import merge as merge_ops
from vidtome_tpu.models.tome import ToMeCall, ToMeConfig
from vidtome_tpu.ops import quant as quant_ops
from vidtome_tpu.ops.attention import attention


class QDense(nn.Module):
    """nn.Dense drop-in with an optional int8 (W8A8) serving path.

    Parameter names/shapes are identical to nn.Dense (kernel [in, out],
    bias [out]), so converted checkpoints load unchanged.  When the caller
    provides a "qparams" collection entry for this module (produced by
    ops/quant.quantize_params), the matmul runs s8 x s8 -> s32 on the MXU
    with dynamic per-row activation scales; otherwise the standard bf16
    path runs.  Policy (which layers quantize) lives in quantize_params,
    not here."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        def bias_param():
            # declared AFTER the kernel on the init path so the parameter
            # RNG stream matches nn.Dense exactly (param creation order
            # determines the per-param fold of the init key)
            return (self.param("bias", nn.initializers.zeros,
                               (self.features,)) if self.use_bias else None)

        if self.has_variable("qparams", "kernel_q"):
            kq = self.get_variable("qparams", "kernel_q")
            sc = self.get_variable("qparams", "scale")
            act = (self.get_variable("qparams", "act_scale")
                   if self.has_variable("qparams", "act_scale") else None)
            y = quant_ops.int8_dense(x, kq, sc, self.dtype, act_scale=act)
            bias = bias_param()
            return y if bias is None else y + bias.astype(self.dtype)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        x, kernel, bias = nn_dtypes.promote_dtype(x, kernel, bias_param(),
                                                  dtype=self.dtype)
        y = jnp.dot(x, kernel)
        return y if bias is None else y + bias


class QConv(nn.Module):
    """nn.Conv drop-in (NHWC, HWIO kernel) with an optional int8 path —
    same contract as QDense.  Covers the argument subset this model zoo
    uses: int-or-pair strides, int / 'SAME' / 'VALID' padding."""

    features: int
    kernel_size: tuple[int, int]
    strides: Any = 1
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        strides = (self.strides if isinstance(self.strides, (tuple, list))
                   else (self.strides, self.strides))
        if isinstance(self.padding, int):
            padding = [(self.padding, self.padding)] * 2
        else:
            padding = self.padding

        def bias_param():
            # kernel-first declaration order matches nn.Conv's init RNG
            # stream (see QDense)
            return (self.param("bias", nn.initializers.zeros,
                               (self.features,)) if self.use_bias else None)

        if self.has_variable("qparams", "kernel_q"):
            kq = self.get_variable("qparams", "kernel_q")
            sc = self.get_variable("qparams", "scale")
            act = (self.get_variable("qparams", "act_scale")
                   if self.has_variable("qparams", "act_scale") else None)
            y = quant_ops.int8_conv(x, kq, sc, strides, padding, self.dtype,
                                    act_scale=act)
            bias = bias_param()
            return y if bias is None else y + bias.astype(self.dtype)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features))
        x, kernel, bias = nn_dtypes.promote_dtype(x, kernel, bias_param(),
                                                  dtype=self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, kernel, strides, padding,
                                         dimension_numbers=dn)
        return y if bias is None else y + bias


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (SD convention: flip_sin_to_cos=True,
    freq_shift=0). t: [] or [B] -> [B, dim]."""
    t = jnp.atleast_1d(t).astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = t[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer MLP on the sinusoidal embedding."""

    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, emb):
        emb = QDense(self.dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = QDense(self.dim, dtype=self.dtype, name="linear_2")(emb)
        return emb


class FusedGroupNorm(nn.Module):
    """GroupNorm (+ optional fused SiLU) with Pallas statistics
    (ops/groupnorm.py) — used only for large spatial slabs (VAE
    encode/decode), where it cut 512p decode from 1.54s to 0.99s per 32
    frames on v5e.  Param tree matches nn.GroupNorm (scale/bias [C]) so
    converted checkpoints load unchanged."""

    num_groups: int
    epsilon: float = 1e-5
    silu: bool = False
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        from vidtome_tpu.ops.groupnorm import group_norm

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return group_norm(x, scale, bias, self.num_groups, self.epsilon,
                          silu=self.silu, use_pallas=self.use_pallas)


def _group_norm(x, name, num_groups=32, eps=1e-5, silu=False,
                use_pallas=None):
    """GroupNorm at the compute dtype; ``silu=True`` folds in the
    activation that always follows resnet norms.  Large spatial slabs on
    TPU route to the Pallas-statistics kernel; everything else stays on
    flax nn.GroupNorm, whose compiled pattern measured fastest for
    UNet-scale shapes (in-graph: 458ms/step flax vs 484 pallas vs 567
    hand-written XLA formula).  Clamps the group count for tiny test
    configs (SD channel counts are always multiples of 32)."""
    from vidtome_tpu.ops.groupnorm import pallas_eligible

    groups = num_groups
    while x.shape[-1] % groups != 0:
        groups //= 2
    if pallas_eligible(x, use_pallas):
        return FusedGroupNorm(num_groups=groups, epsilon=eps, silu=silu,
                              use_pallas=use_pallas, name=name)(x)
    y = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=x.dtype,
                     name=name)(x)
    return nn.silu(y) if silu else y


class _ParamPair(nn.Module):
    """Declares GroupNorm-compatible (scale, bias) parameters without the
    compute — used by the fused-resnet path so both dispatch modes create
    the identical parameter tree (names, shapes, dtypes, creation order
    match nn.GroupNorm)."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return s, b


class _ConvParams(nn.Module):
    """QConv/nn.Conv-compatible (kernel, bias) declaration (kernel first:
    same init-RNG stream as QConv).  Also surfaces the module's int8
    "qparams" entry (kernel_q + per-channel scale) when
    ops/quant.quantize_params produced one, so the fused-resnet path can
    run the same W8A8 serving scheme as QConv."""

    shape: tuple

    @nn.compact
    def __call__(self):
        if self.has_variable("qparams", "kernel_q"):
            # quantize_params strips the bf16 kernel from quantized
            # layers; declaring it here would ScopeParamNotFoundError on
            # apply — mirror QConv's qparams-first order exactly
            b = self.param("bias", nn.initializers.zeros,
                           (self.shape[-1],))
            return None, b, (self.get_variable("qparams", "kernel_q"),
                             self.get_variable("qparams", "scale"))
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b, None


class ResnetBlock2D(nn.Module):
    """GN -> silu -> conv3x3 -> +temb -> GN -> silu -> conv3x3 (+shortcut).

    PnP conv-feature injection (reference utils/pnp_utils.py:146-155): when
    ``inject`` is true, lanes 1.. of the batch take lane 0's features after
    conv2, before the shortcut add.

    ``resnet_mode="fused"`` (config key ``generation.resnet_mode`` /
    ``inversion.resnet_mode``) routes eligible shapes through the fused
    Pallas block kernel (ops/resnet.py, DESIGN §8.4): TPU backend, bf16,
    no PnP injection, fp32 conv accumulator within the VMEM budget.  The
    parameter tree is identical in both modes."""

    out_channels: int
    dtype: Any = jnp.bfloat16
    use_pallas: Optional[bool] = None
    resnet_mode: str = "off"
    # whether the serving path quantized the conv weights (int8 W8A8) —
    # dispatch-policy input only; the actual branch keys off qparams
    resnet_quant: bool = False
    # "measured" routes only shapes where the kernel beat XLA on v5e
    # (tools/exp_resnet.py); "all" routes every budget-eligible shape
    # (kernel correctness tests)
    resnet_policy: str = "measured"

    def _fused_ok(self, x, inject) -> bool:
        if self.resnet_mode != "fused" or inject is not None:
            return False
        if self.dtype != jnp.bfloat16:
            return False
        use = (self.use_pallas if self.use_pallas is not None
               else jax.default_backend() == "tpu")
        if not use:
            return False
        B, H, W, Ci = x.shape
        rows = H * W
        op = -(-self.out_channels // 128) * 128
        if rows % 8 != 0:
            return False
        # Real per-core VMEM working set of the larger call (kernel A):
        # fp32 conv accumulator [rows, Op] + the double-buffered
        # per-chunk weight block [128, 9, Op] + double-buffered input
        # chunk [H, W, 128] + double-buffered output m-tile (~1MB cap,
        # ops/resnet._pick_mr) + the group-collapse matrices [Cp, Gp] x2.
        # The old `rows*op*4 <= 6.5MB` proxy missed the weight block and
        # let SDXL's [*, 32, 32, 1280] shape through at 17.57M > the
        # 16MB scoped limit (real-TPU compile OOM, round 5).
        cp = -(-Ci // 128) * 128
        gp = 128
        vmem = (rows * op * 4                 # acc
                + 2 * (128 * 9 * op * 2)      # w chunk (bf16/int8<=bf16)
                + 2 * (rows * 128 * 2)        # x chunk in
                + 2 * (1 << 20)               # out m-tiles
                + 2 * (max(cp, op) * gp * 4)  # gdown/gup
                )
        if vmem > (14 << 20):
            return False
        if self.resnet_policy == "all":
            return True
        # Measured-win dispatch (tools/exp_resnet.py, v5e, 512p shapes):
        # int8 wins only at level-0 rows (320->320 1.88x, 640->320 1.19x;
        # level-1 loses 0.89x/0.53x — XLA's int8 convs are strong at
        # 32x32); bf16 wins only on identity-shortcut shapes (320->320
        # 1.32x, 640->640 1.13x; projection shapes lose 0.94x/0.68x —
        # the serialized 1x1-shortcut dots stall the conv2 phase).
        if self.resnet_quant:
            return rows >= 4096
        return Ci == self.out_channels and rows >= 1024

    def _fused(self, x, temb):
        from vidtome_tpu.ops.resnet import fused_resnet

        Ci, Co = x.shape[-1], self.out_channels
        n1s, n1b = _ParamPair(Ci, name="norm1")()
        w1, b1, q1 = _ConvParams((3, 3, Ci, Co), name="conv1")()
        tk, tb, _ = _ConvParams((temb.shape[-1], Co),
                                name="time_emb_proj")()
        n2s, n2b = _ParamPair(Co, name="norm2")()
        w2, b2, q2 = _ConvParams((3, 3, Co, Co), name="conv2")()
        ws = bs = None
        if Ci != Co:
            wsk, bs, _ = _ConvParams((1, 1, Ci, Co),
                                     name="conv_shortcut")()
            ws = wsk.reshape(Ci, Co)
        te = nn.silu(temb.astype(jnp.float32))
        tvec = jnp.dot(te, tk.astype(jnp.float32)) + tb
        groups1 = 32
        while Ci % groups1:
            groups1 //= 2
        # ops/resnet.py clamps per-tensor internally via the same rule
        quant = q1 is not None and q2 is not None
        assert (q1 is None) == (q2 is None), (
            "fused resnet needs conv1/conv2 quantized together (the "
            "ops/quant policy always does)")
        assert tk is not None, (
            "time_emb_proj must stay bf16 (ops/quant policy excludes it)")
        if quant:
            (w1, s1), (w2, s2) = q1, q2
        else:
            s1 = s2 = None
        return fused_resnet(x.astype(jnp.bfloat16), tvec, n1s, n1b, w1,
                            b1, n2s, n2b, w2, b2, ws, bs, s1, s2,
                            num_groups=groups1, quant=quant,
                            interpret=jax.default_backend() != "tpu",
                            ).astype(self.dtype)

    @nn.compact
    def __call__(self, x, temb, inject: Optional[jnp.ndarray] = None,
                 num_lanes: int = 1):
        if self._fused_ok(x, inject):
            return self._fused(x, temb)
        h = _group_norm(x, "norm1", silu=True)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                  name="conv1")(h)
        temb_proj = QDense(self.out_channels, dtype=self.dtype,
                           name="time_emb_proj")(nn.silu(temb))
        h = h + temb_proj[:, None, None, :]
        h = _group_norm(h, "norm2", silu=True)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                  name="conv2")(h)

        if inject is not None and num_lanes > 1:
            h = inject_lane0(h, num_lanes, inject)

        if x.shape[-1] != self.out_channels:
            x = QConv(self.out_channels, (1, 1), dtype=self.dtype,
                      name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return QConv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                     name="conv")(x)


def inject_lane0(x: jnp.ndarray, num_lanes: int, flag: jnp.ndarray) -> jnp.ndarray:
    """Replace every lane's values with lane 0's when ``flag`` is true.

    The batch axis is lane-major: [lane0 block | lane1 block | ...] where a
    block is either one joined sample or F frames.  This implements both PnP
    attention QK sharing and conv feature injection as a select, keeping the
    compiled graph static (reference does in-place slice assignment,
    utils/pnp_utils.py:62-70,146-155)."""
    per = x.shape[0] // num_lanes
    lane0 = jnp.tile(x[:per], (num_lanes,) + (1,) * (x.ndim - 1))
    return jnp.where(flag, lane0, x)


class CrossAttention(nn.Module):
    """Multi-head attention with flash-attention on the hot path.

    ``share_qk``: traced bool — PnP source-attention injection: q and k come
    from lane 0 (the source branch) for every lane, so all lanes reuse the
    source attention map on their own values
    (reference utils/pnp_utils.py:47-95)."""

    query_dim: int
    heads: int
    head_dim: int
    context_dim: Optional[int] = None
    dtype: Any = jnp.bfloat16
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, context=None, share_qk=None, num_lanes: int = 1,
                 kv_valid_len: Optional[int] = None):
        inner = self.heads * self.head_dim
        is_cross = context is not None
        ctx = context if is_cross else x

        q = QDense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = QDense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = QDense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        if share_qk is not None and num_lanes > 1:
            q = inject_lane0(q, num_lanes, share_qk)
            k = inject_lane0(k, num_lanes, share_qk)

        B, S, _ = q.shape
        Skv = k.shape[1]

        def split_heads(t, s):
            return t.reshape(B, s, self.heads, self.head_dim).transpose(0, 2, 1, 3)

        out = attention(
            split_heads(q, S), split_heads(k, Skv), split_heads(v, Skv),
            kv_valid_len=kv_valid_len, use_pallas=self.use_pallas,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, S, inner)
        return QDense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = QDense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) gelu: diffusers GEGLU uses F.gelu, not the tanh
        # approximation — keeps converted checkpoints numerically faithful
        h = h * nn.gelu(gate, approximate=False)
        return QDense(self.dim, dtype=self.dtype, name="proj_out")(h)


def _layer_norm(x, name, eps=1e-5):
    # fp32 stats happen inside flax; keep activations at compute dtype.
    return nn.LayerNorm(epsilon=eps, dtype=x.dtype, name=name)(x)


class _DenseParams(nn.Module):
    """QDense-compatible (kernel[, bias]) declaration without the compute
    (kernel-first: same init-RNG stream as QDense) — used by the fused
    cross-attention sublayer so both dispatch modes create the identical
    parameter tree."""

    shape: tuple
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = (self.param("bias", nn.initializers.zeros, (self.shape[-1],))
             if self.use_bias else None)
        return k, b


class _AttnParams(nn.Module):
    """CrossAttention-compatible parameter tree (to_q/to_k/to_v/to_out in
    that creation order) for the fused sublayer path."""

    query_dim: int
    inner: int
    context_dim: int

    @nn.compact
    def __call__(self):
        wq, _ = _DenseParams((self.query_dim, self.inner), use_bias=False,
                             name="to_q")()
        wk, _ = _DenseParams((self.context_dim, self.inner),
                             use_bias=False, name="to_k")()
        wv, _ = _DenseParams((self.context_dim, self.inner),
                             use_bias=False, name="to_v")()
        wo, bo = _DenseParams((self.inner, self.query_dim), name="to_out")()
        return wq, wk, wv, wo, bo


class TransformerBlock(nn.Module):
    """Transformer block with integrated cross-frame token merging.

    The merging wraps ONLY self-attention (the diffusers path of the
    reference, patch.py:148-169): norm1 -> [join frames -> local merge ->
    optional global merge vs bank] -> attn1 -> unmerge -> residual ->
    norm2 -> attn2(cross) -> residual -> norm3 -> ff -> residual.
    """

    dim: int
    heads: int
    head_dim: int
    context_dim: int
    downsample: int                       # static spatial downsample of this level
    tome: Optional[ToMeConfig] = None
    dtype: Any = jnp.bfloat16
    use_pallas: Optional[bool] = None
    # "fused" routes the add+LN2+attn2+add+LN3 chain through the Pallas
    # sublayer kernel (ops/sublayer.py) — bf16 TPU serving only; the
    # parameter tree is identical in both modes
    sublayer_mode: str = "off"

    def _fused_sublayer_ok(self, cfg, do_merge) -> bool:
        if self.sublayer_mode != "fused" or self.dtype != jnp.bfloat16:
            return False
        if self.heads * self.head_dim != self.dim:
            return False
        # LDM-variant merging wraps attn2/ff in merge/unmerge — the
        # fused chain (which owns both residual adds) does not apply
        if do_merge and (cfg.merge_crossattn or cfg.merge_ff):
            return False
        use = (self.use_pallas if self.use_pallas is not None
               else jax.default_backend() == "tpu")
        return bool(use)

    @nn.compact
    def __call__(self, x, context, tome_call: Optional[ToMeCall] = None,
                 attn_inject=None, num_lanes: int = 1):
        cfg = self.tome
        do_merge = (
            cfg is not None
            and tome_call is not None
            and self.downsample <= cfg.max_downsample
            and cfg.frames > 1
        )
        plans: list = []

        norm_x = _layer_norm(x, "norm1")

        if do_merge:
            F = cfg.frames
            key_local, key_coin = jax.random.split(
                jax.random.fold_in(tome_call.key, 0))
            joined = merge_ops.join_frames(norm_x, F)

            # share_match: the first block at each resolution level computes
            # the matching; siblings reuse the (traced) plan index arrays.
            cache = (tome_call.plan_cache
                     if cfg.share_match and tome_call.plan_cache is not None
                     else None)
            cache_key = (self.downsample, joined.shape[1], joined.shape[2])
            cached = cache.get(cache_key) if cache is not None else None

            if cached is not None:
                plans = cached["plans"]
                tokens = joined
                for p in plans:
                    tokens = merge_ops.merge(tokens, p, cfg.merge_mode)
                local_tokens = tokens
            else:
                local_tokens, plans = merge_ops.compute_local_merge(
                    joined, F, cfg.local_merge_ratio, key_local,
                    target_stride=cfg.target_stride,
                    align_batch=cfg.align_batch, mode=cfg.merge_mode,
                    len_quantum=cfg.len_quantum,
                )
                tokens = local_tokens
            global_plan = None
            local_is_src = None
            L = local_tokens.shape[1]

            if cfg.merge_global and tome_call.bank_mode != "off":
                bank = self.variable(
                    "tome_bank", "bank",
                    lambda: jnp.zeros(local_tokens.shape, local_tokens.dtype))
                if tome_call.bank_mode == "init":
                    bank.value = jax.lax.stop_gradient(local_tokens)
                else:
                    # Coin flip: which side plays src (reference
                    # patch.py:59-75). Both partitions have length L so the
                    # concat order is a traced select with static shapes.
                    coin = jax.random.uniform(key_coin, ())
                    local_is_src = coin > cfg.global_rand
                    bank_tokens = bank.value.astype(local_tokens.dtype)
                    cat_ls = jnp.concatenate([local_tokens, bank_tokens], 1)
                    cat_sl = jnp.concatenate([bank_tokens, local_tokens], 1)
                    tokens_cat = jnp.where(local_is_src, cat_ls, cat_sl)
                    if cached is not None and "global_plan" in cached:
                        global_plan = cached["global_plan"]
                    else:
                        global_plan = merge_ops.two_set_matching(
                            tokens_cat, src_len=L,
                            ratio=cfg.global_merge_ratio,
                            align_batch=cfg.align_batch,
                            keep_sorted_indices=cfg.merge_mode != "replace",
                            len_quantum=cfg.len_quantum,
                        )
                        if cache is not None:
                            cache.setdefault(cache_key, {})[
                                "global_plan"] = global_plan
                    tokens = merge_ops.merge(tokens_cat, global_plan,
                                             cfg.merge_mode)
                    # Bank update: unmerged LOCAL partition of the merged
                    # normed tokens (reference patch.py:80).
                    full = merge_ops.unmerge(tokens, global_plan)
                    local_part = jnp.where(
                        local_is_src, full[:, :L], full[:, L:])
                    bank.value = jax.lax.stop_gradient(local_part)

            if cache is not None and cached is None:
                cache.setdefault(cache_key, {})["plans"] = plans

            if cfg.collect_stats:
                # Observability: per-block token compression + how much of
                # the sequence the attention actually sees (generalizes the
                # reference's collect_from_patch attribute scraper).
                self.sow("tome_stats", "seq_len",
                         jnp.asarray(norm_x.shape[0] * norm_x.shape[1]),
                         reduce_fn=lambda _, x: x)
                self.sow("tome_stats", "merged_len",
                         jnp.asarray(tokens.shape[0] * tokens.shape[1]),
                         reduce_fn=lambda _, x: x)

            attn_out = CrossAttention(
                query_dim=self.dim, heads=self.heads, head_dim=self.head_dim,
                dtype=self.dtype, use_pallas=self.use_pallas, name="attn1",
            )(tokens, share_qk=attn_inject, num_lanes=num_lanes)

            if global_plan is not None:
                full = merge_ops.unmerge(attn_out, global_plan)
                attn_out = jnp.where(local_is_src, full[:, :L], full[:, L:])
            attn_out = merge_ops.unmerge_all(attn_out, plans)
            attn_out = merge_ops.split_frames(attn_out, F)
        else:
            attn_out = CrossAttention(
                query_dim=self.dim, heads=self.heads, head_dim=self.head_dim,
                dtype=self.dtype, use_pallas=self.use_pallas, name="attn1",
            )(norm_x, share_qk=attn_inject, num_lanes=num_lanes)

        if self._fused_sublayer_ok(cfg, do_merge):
            # one Pallas call for add+LN2+to_q+cross-attn+to_out+add+LN3
            # (ops/sublayer.py); K/V from the 77-token context stay two
            # tiny XLA matmuls.  Parameter creation order matches the
            # standard path exactly (norm2, attn2, norm3, ff).
            from vidtome_tpu.ops.sublayer import fused_cross_sublayer

            n2s, n2b = _ParamPair(self.dim, name="norm2")()
            wq, wk, wv, wo, bo = _AttnParams(
                self.dim, self.heads * self.head_dim, self.context_dim,
                name="attn2")()
            n3s, n3b = _ParamPair(self.dim, name="norm3")()
            ctx = context.astype(self.dtype)
            kctx = jnp.dot(ctx, wk.astype(self.dtype))
            vctx = jnp.dot(ctx, wv.astype(self.dtype))
            x3, y3 = fused_cross_sublayer(
                x.astype(jnp.bfloat16), attn_out.astype(jnp.bfloat16),
                kctx, vctx, wq, wo, bo, n2s, n2b, n3s, n3b,
                heads=self.heads, kv_len=context.shape[1],
                interpret=jax.default_backend() != "tpu")
            ff = GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")
            return (x3 + ff(y3)).astype(self.dtype)

        x = x + attn_out

        # LDM-variant merging (reference make_tome_block wraps attn2 and ff
        # with the same merge/unmerge, patch.py:104-114; opt-in here since
        # the diffusers path the pipeline uses wraps only attn1): reuse the
        # LOCAL plans — the global bank stays an attn1-only concern.
        def merge_local(t):
            j = merge_ops.join_frames(t, cfg.frames)
            for p in plans:
                j = merge_ops.merge(j, p, cfg.merge_mode)
            return j

        def unmerge_local(t):
            return merge_ops.split_frames(
                merge_ops.unmerge_all(t, plans), cfg.frames)

        attn2 = CrossAttention(
            query_dim=self.dim, heads=self.heads, head_dim=self.head_dim,
            context_dim=self.context_dim, dtype=self.dtype,
            use_pallas=self.use_pallas, name="attn2")
        h = _layer_norm(x, "norm2")
        if do_merge and cfg.merge_crossattn and plans:
            # context rows are lane-major repeated per frame: one row per
            # joined lane is context[::frames]
            x = x + unmerge_local(
                attn2(merge_local(h), context=context[:: cfg.frames]))
        else:
            x = x + attn2(h, context=context)

        ff = GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")
        h = _layer_norm(x, "norm3")
        if do_merge and cfg.merge_ff and plans:
            x = x + unmerge_local(ff(merge_local(h)))
        else:
            x = x + ff(h)
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> proj_in -> blocks -> proj_out (+residual).

    ``use_linear_projection``: SD2.x uses linear proj (reshape first);
    SD1.x uses 1x1 conv."""

    channels: int
    heads: int
    head_dim: int
    context_dim: int
    depth: int = 1
    downsample: int = 1
    use_linear_projection: bool = False
    tome: Optional[ToMeConfig] = None
    dtype: Any = jnp.bfloat16
    use_pallas: Optional[bool] = None
    sublayer_mode: str = "off"

    @nn.compact
    def __call__(self, x, context, tome_call=None, attn_inject=None,
                 num_lanes: int = 1):
        B, H, W, C = x.shape
        residual = x
        h = _group_norm(x, "norm", eps=1e-6)
        if self.use_linear_projection:
            h = h.reshape(B, H * W, C)
            h = QDense(self.channels, dtype=self.dtype, name="proj_in")(h)
        else:
            h = QConv(self.channels, (1, 1), dtype=self.dtype,
                      name="proj_in")(h)
            h = h.reshape(B, H * W, self.channels)

        for i in range(self.depth):
            h = TransformerBlock(
                dim=self.channels, heads=self.heads, head_dim=self.head_dim,
                context_dim=self.context_dim, downsample=self.downsample,
                tome=self.tome, dtype=self.dtype, use_pallas=self.use_pallas,
                sublayer_mode=self.sublayer_mode,
                name=f"transformer_blocks_{i}",
            )(h, context, tome_call=tome_call, attn_inject=attn_inject,
              num_lanes=num_lanes)

        if self.use_linear_projection:
            h = QDense(self.channels, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(B, H, W, self.channels)
        else:
            h = h.reshape(B, H, W, self.channels)
            h = QConv(self.channels, (1, 1), dtype=self.dtype,
                      name="proj_out")(h)
        return h + residual
