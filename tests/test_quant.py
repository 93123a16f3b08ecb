"""Int8 (W8A8) serving path: op parity, module fallback identity, and
whole-UNet quantized-vs-bf16 closeness.

The quantized path has no reference counterpart to oracle against (the
reference's speed/quality dial is fp16, utils/utils.py:42-66); correctness
here means (a) the bf16 fallback of QDense/QConv is numerically identical
to stock flax so enabling the feature cannot perturb the default path, and
(b) the int8 path tracks fp32 within the error budget symmetric-per-channel
W8A8 admits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from vidtome_tpu.models.layers import QConv, QDense
from vidtome_tpu.ops import quant


def _rel_rmse(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.sqrt(np.mean((a - b) ** 2))
                 / (np.sqrt(np.mean(b ** 2)) + 1e-12))


# ----------------------------------------------------------------- ops


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.key(0), (64, 32)) * jnp.asarray(
        np.geomspace(0.01, 10.0, 32), jnp.float32)  # per-channel ranges
    q, s = quant.quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    # absmax-int8 on ~N(0,1): step = amax/127 ~ 3.5sigma/127, rel RMSE
    # ~= step/sqrt(12)/sigma ~= 0.007 — anything materially above that
    # means a broken scale axis
    assert _rel_rmse(deq, w) < 0.008


def test_int8_dense_tracks_fp32():
    x = jax.random.normal(jax.random.key(1), (128, 96), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(2), (96, 64)) * 0.05
    wq, ws = quant.quantize_weight(w)
    y = quant.int8_dense(x, wq, ws, jnp.float32)
    ref = jnp.dot(x.astype(jnp.float32), w)
    assert _rel_rmse(y, ref) < 0.02


def test_int8_dense_outlier_rows():
    # per-row scales must absorb a 100x hotter row without degrading others
    x = jnp.ones((4, 64), jnp.float32)
    x = x.at[2].mul(100.0)
    w = jax.random.normal(jax.random.key(3), (64, 16)) * 0.1
    wq, ws = quant.quantize_weight(w)
    y = quant.int8_dense(x, wq, ws, jnp.float32)
    ref = x @ w
    assert _rel_rmse(y[0], ref[0]) < 0.02
    assert _rel_rmse(y[2], ref[2]) < 0.02


def test_int8_conv_tracks_fp32():
    x = jax.random.normal(jax.random.key(4), (2, 8, 8, 16), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(5), (3, 3, 16, 24)) * 0.1
    wq, ws = quant.quantize_weight(w)
    y = quant.int8_conv(x, wq, ws, (1, 1), [(1, 1), (1, 1)], jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn)
    assert _rel_rmse(y, ref) < 0.03


# ----------------------------------------- module fallback identity


def test_qdense_bf16_identical_to_nn_dense():
    x = jax.random.normal(jax.random.key(6), (5, 7, 48), jnp.bfloat16)
    ref_mod = nn.Dense(32, dtype=jnp.bfloat16)
    params = ref_mod.init(jax.random.key(7), x)
    ours = QDense(32, dtype=jnp.bfloat16).apply(params, x)
    theirs = ref_mod.apply(params, x)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(theirs))


@pytest.mark.parametrize("kwargs", [
    dict(kernel_size=(3, 3), padding=1),
    dict(kernel_size=(3, 3), strides=(2, 2), padding=1),
    dict(kernel_size=(1, 1)),
])
def test_qconv_bf16_identical_to_nn_conv(kwargs):
    x = jax.random.normal(jax.random.key(8), (2, 8, 8, 16), jnp.bfloat16)
    ref_mod = nn.Conv(24, dtype=jnp.bfloat16, **kwargs)
    params = ref_mod.init(jax.random.key(9), x)
    ours = QConv(24, dtype=jnp.bfloat16, **kwargs).apply(params, x)
    theirs = ref_mod.apply(params, x)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(theirs))


def test_qdense_int8_via_collection():
    x = jax.random.normal(jax.random.key(10), (16, 48), jnp.bfloat16)
    mod = QDense(32, dtype=jnp.float32)
    params = mod.init(jax.random.key(11), x)
    wq, ws = quant.quantize_weight(params["params"]["kernel"])
    out = mod.apply(
        {"params": {"bias": params["params"]["bias"]},
         "qparams": {"kernel_q": wq, "scale": ws}}, x)
    ref = mod.apply(params, x)
    assert _rel_rmse(out, ref) < 0.02


# ------------------------------------------------- parameter transform


def _tiny_unet():
    from vidtome_tpu.models.registry import _jit_init
    from vidtome_tpu.models.unet import TINY_UNET, UNet2DConditionModel

    unet = UNet2DConditionModel(config=TINY_UNET, dtype=jnp.float32)
    x = jnp.zeros((2, 16, 16, 4), jnp.float32)
    ctx = jnp.zeros((2, 8, 32), jnp.float32)
    params = _jit_init(unet, x, jnp.asarray(0), ctx)
    return unet, params, x, ctx


def test_quantize_params_structure():
    unet, params, x, ctx = _tiny_unet()
    residual, qparams = quant.quantize_params(params)
    # excluded-by-default layers keep their bf16 kernels
    assert "kernel" in residual["conv_in"]
    assert "kernel" in residual["conv_out"]
    assert "kernel" in residual["time_embedding"]["linear_1"]
    assert "time_embedding" not in qparams
    # attention/ff/resnet kernels moved
    blk = qparams["down_0_attentions_0"]["transformer_blocks_0"]
    assert blk["attn1"]["to_q"]["kernel_q"].dtype == jnp.int8
    assert blk["ff"]["proj_in"]["kernel_q"].dtype == jnp.int8
    # ff/proj_out stays bf16 (wide-hidden amax costs more than the win)
    assert "proj_out" not in blk["ff"]
    assert "kernel" in residual["down_0_attentions_0"][
        "transformer_blocks_0"]["ff"]["proj_out"]
    # post-GROUPNORM modules carry static activation scales
    rn = qparams["down_0_resnets_0"]
    assert float(rn["conv1"]["act_scale"]) > 0
    assert float(rn["conv2"]["act_scale"]) > 0
    assert "act_scale" in qparams["down_0_attentions_0"]["proj_in"]
    # LayerNorm-fed matmuls stay DYNAMIC per-row: LN bounds a single
    # outlier channel only by ~sqrt(C)*|gamma|, and real SD checkpoints
    # have such channels — a static 6-sigma scale would clip them
    assert "act_scale" not in blk["attn1"]["to_q"]
    assert "act_scale" not in blk["ff"]["proj_in"]
    assert "act_scale" not in blk["attn2"]["to_q"]
    # attn2 k/v read the text context (not normed here): dynamic
    assert "act_scale" not in blk["attn2"]["to_k"]
    # un-normed-input layers are excluded from quantization entirely
    assert "down_0_downsample" not in qparams
    assert "proj_out" not in qparams["down_0_attentions_0"]
    assert "kernel" in residual["down_0_downsample"]["conv"]
    assert "kernel" not in residual["down_0_resnets_0"]["conv1"]
    assert "bias" in residual["down_0_resnets_0"]["conv1"]
    assert quant.count_quantized(qparams) > 10


def test_static_act_scale_quality():
    """Static post-norm scales must not degrade accuracy materially vs
    dynamic scales on realistic (normed) activations."""
    import flax.linen as nn2

    C = 64
    key = jax.random.key(20)
    gamma = 1.0 + 0.3 * jax.random.normal(jax.random.fold_in(key, 0), (C,))
    beta = 0.2 * jax.random.normal(jax.random.fold_in(key, 1), (C,))
    x = jax.random.normal(key, (4, 256, C))
    gn = nn2.GroupNorm(num_groups=32)
    y = jax.nn.silu(
        gn.apply({"params": {"scale": gamma, "bias": beta}}, x))
    w = jax.random.normal(jax.random.fold_in(key, 2), (C, 32)) * 0.1
    wq, ws = quant.quantize_weight(w)
    s = quant.static_act_scale(gamma, beta)
    got = quant.int8_dense(y, wq, ws, jnp.float32, act_scale=s)
    ref = y.reshape(-1, C).astype(jnp.float32) @ w
    # K=6 is sized for ~1e7-element production slabs (expected max ~5.5
    # sigma); on this 1k-element slab the true amax is ~3.3 sigma, so the
    # static grid is ~1.8x coarser than dynamic — budget accordingly
    assert _rel_rmse(got.reshape(-1, 32), ref) < 0.05


@pytest.mark.slow
def test_pipeline_int8_generation(tmp_path):
    """Full invert -> int8 generate on the tiny bundle: the quantized
    serving path must run end-to-end and stay close to the fp32 pipeline
    (same seed, same schedules)."""
    import os

    from tests.helpers import make_tiny_bundle, make_tiny_video
    from tests.test_pipeline_e2e import _base_config
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.pipeline.inverter import Inverter

    bundle = make_tiny_bundle()
    video_dir = make_tiny_video(str(tmp_path / "frames"), n_frames=4,
                                size=64)
    cfg = _base_config(str(tmp_path), video_dir, chunk_size=2)
    inv = Inverter(bundle, cfg, use_pallas=False)
    inv(video_dir, cfg.inversion.save_path)
    lat_dir = os.path.join(cfg.inversion.save_path, bundle.model_key)
    assert os.path.isdir(lat_dir)

    outs = {}
    for mode in ("none", "int8"):
        cfg_m = _base_config(str(tmp_path), video_dir, chunk_size=2,
                             quant=mode,
                             output_path=str(tmp_path / f"out_{mode}"))
        gen = Generator(bundle, cfg_m, use_pallas=False)
        frames = gen(video_dir, cfg.inversion.save_path,
                     cfg_m.generation.output_path, frame_ids=[0, 1, 2, 3])
        outs[mode] = np.asarray(frames["edit"], np.float32)
    assert np.all(np.isfinite(outs["int8"]))
    # decoded frames in [0,1]: per-layer int8 drift (~2-4%) compounds
    # through 4 denoise steps each amplified 7.5x by CFG on a tiny
    # random-weight model — this bounds gross breakage (sign flips, wrong
    # scales); real-scale quality is gated by tools/quality_gate.py PSNR
    assert _rel_rmse(outs["int8"], outs["none"]) < 0.25


@pytest.mark.slow
def test_inverter_int8_runs():
    from tests.helpers import make_tiny_bundle
    from tests.test_pipeline_e2e import _base_config
    from vidtome_tpu.pipeline.inverter import Inverter

    bundle = make_tiny_bundle()
    cfg = _base_config("/tmp/unused_q", "/tmp/unused_q")
    cfg["inversion"]["quant"] = "int8"
    inv = Inverter(bundle, cfg, use_pallas=False)
    assert "unet_q" in inv._params
    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 4), jnp.float32)
    conds = jax.random.normal(jax.random.key(1), (4, 16, 32), jnp.float32)
    out = inv._run(x, conds, None, None, inversion=True)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_quantized_unet_close_to_fp32():
    unet, params, x, ctx = _tiny_unet()
    x = jax.random.normal(jax.random.key(12), x.shape, x.dtype)
    ctx = jax.random.normal(jax.random.key(13), ctx.shape, ctx.dtype)
    ref = unet.apply({"params": params}, x, jnp.asarray(3), ctx)
    residual, qparams = quant.quantize_params(params)
    out = unet.apply({"params": residual, "qparams": qparams}, x,
                     jnp.asarray(3), ctx)
    assert out.shape == ref.shape
    # random-weight tiny net, full int8 stack: expect a few percent drift
    assert _rel_rmse(out, ref) < 0.08


@pytest.mark.slow
def test_controlnet_int8_residuals_close():
    """ControlNet shares the UNet block classes, so quantize_params with
    the controlnet exclusions (zero convs + hint encoder stay bf16) must
    produce residuals close to the bf16 path."""
    from vidtome_tpu.models.controlnet import ControlNetModel
    from vidtome_tpu.models.unet import TINY_UNET

    cn = ControlNetModel(config=TINY_UNET, dtype=jnp.bfloat16,
                         use_pallas=False)
    key = jax.random.key(31)
    x = jax.random.normal(key, (2, 8, 8, 4), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 32),
                            jnp.bfloat16)
    cond = jax.random.normal(jax.random.fold_in(key, 2), (2, 64, 64, 3),
                             jnp.bfloat16)
    params = cn.init(jax.random.key(0), x, jnp.asarray(0), ctx,
                     cond)["params"]
    down_b, mid_b = cn.apply({"params": params}, x, jnp.asarray(0), ctx,
                             cond, conditioning_scale=0.5)

    res, qp = quant.quantize_params(
        params, exclude=quant.DEFAULT_EXCLUDE + r"|zero_conv|cond_embedding")
    # exclusions hold: zero convs + hint encoder keep bf16 kernels
    assert "zero_convs_0" not in qp and "mid_zero_conv" not in qp
    assert "cond_embedding" not in qp
    assert "kernel" in res["zero_convs_0"]
    assert quant.count_quantized(qp) > 4  # resnet/attention mass moved
    down_q, mid_q = cn.apply({"params": res, "qparams": qp}, x,
                             jnp.asarray(0), ctx, cond,
                             conditioning_scale=0.5)
    for b, q in list(zip(down_b, down_q)) + [(mid_b, mid_q)]:
        b = np.asarray(b, np.float32)
        q = np.asarray(q, np.float32)
        scale = np.abs(b).max() + 1e-3
        assert np.abs(b - q).max() / scale < 0.12
