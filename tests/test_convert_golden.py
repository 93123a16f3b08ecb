"""Golden numerical tests for the checkpoint converter.

Builds tiny diffusers-format checkpoints (real key names incl. ``to_out.0``,
``ff.net.0.proj``, legacy conv-style VAE attention ``query/key/value/
proj_attn``), runs a functional torch oracle implementing the diffusers
forward semantics (reference model backend, SURVEY.md L5 /
`utils/utils.py:19-67`), converts with models/convert.py, and asserts the
flax forward matches to fp32 tolerance.  This is the zero-egress proxy for
the PSNR>=35 real-weight fidelity target (BASELINE.md): any converter
rewrite-rule or layer-semantics regression fails these tests numerically,
not just structurally.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vidtome_tpu.models import convert  # noqa: E402

RNG = np.random.default_rng(42)


def _t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def _w(*shape, scale=0.08):
    return RNG.normal(0.0, scale, size=shape).astype(np.float32)


def _affine(c):
    return (1.0 + 0.05 * RNG.normal(size=c)).astype(np.float32), \
        (0.02 * RNG.normal(size=c)).astype(np.float32)


class State(dict):
    """torch-style flat state dict with helpers to declare modules."""

    def conv(self, name, cin, cout, k=3):
        self[f"{name}.weight"] = _w(cout, cin, k, k)
        self[f"{name}.bias"] = _w(cout)

    def linear(self, name, cin, cout, bias=True):
        self[f"{name}.weight"] = _w(cout, cin)
        if bias:
            self[f"{name}.bias"] = _w(cout)

    def norm(self, name, c):
        w, b = _affine(c)
        self[f"{name}.weight"] = w
        self[f"{name}.bias"] = b


# --------------------------------------------------------------------------
# torch oracle ops (NCHW) — diffusers forward semantics
# --------------------------------------------------------------------------


def t_conv(s, name, x, stride=1, pad=1):
    return TF.conv2d(x, _t(s[f"{name}.weight"]), _t(s[f"{name}.bias"]),
                     stride=stride, padding=pad)


def t_linear(s, name, x):
    b = s.get(f"{name}.bias")
    return TF.linear(x, _t(s[f"{name}.weight"]),
                     None if b is None else _t(b))


def t_gn(s, name, x, groups=32, eps=1e-5):
    while x.shape[1] % groups:
        groups //= 2
    return TF.group_norm(x, groups, _t(s[f"{name}.weight"]),
                         _t(s[f"{name}.bias"]), eps)


def t_ln(s, name, x, eps=1e-5):
    return TF.layer_norm(x, (x.shape[-1],), _t(s[f"{name}.weight"]),
                         _t(s[f"{name}.bias"]), eps)


def t_resnet(s, p, x, temb):
    h = t_conv(s, f"{p}.conv1", TF.silu(t_gn(s, f"{p}.norm1", x)))
    h = h + t_linear(s, f"{p}.time_emb_proj", TF.silu(temb))[:, :, None, None]
    h = t_conv(s, f"{p}.conv2", TF.silu(t_gn(s, f"{p}.norm2", h)))
    if f"{p}.conv_shortcut.weight" in s:
        x = t_conv(s, f"{p}.conv_shortcut", x, pad=0)
    return x + h


def t_mha(s, p, x, ctx, heads):
    B, S, C = x.shape
    D = C // heads
    q = t_linear(s, f"{p}.to_q", x)
    k = t_linear(s, f"{p}.to_k", ctx)
    v = t_linear(s, f"{p}.to_v", ctx)

    def split(t):
        return t.reshape(B, -1, heads, D).transpose(1, 2)

    q, k, v = split(q), split(k), split(v)
    scores = q @ k.transpose(-1, -2) / math.sqrt(D)
    out = torch.softmax(scores, dim=-1) @ v
    out = out.transpose(1, 2).reshape(B, S, C)
    return t_linear(s, f"{p}.to_out.0", out)


def t_tblock(s, p, x, ctx, heads):
    h = t_ln(s, f"{p}.norm1", x)
    x = x + t_mha(s, f"{p}.attn1", h, h, heads)
    x = x + t_mha(s, f"{p}.attn2", t_ln(s, f"{p}.norm2", x), ctx, heads)
    h = t_linear(s, f"{p}.ff.net.0.proj", t_ln(s, f"{p}.norm3", x))
    h, gate = h.chunk(2, dim=-1)
    h = h * TF.gelu(gate)
    return x + t_linear(s, f"{p}.ff.net.2", h)


def t_transformer2d(s, p, x, ctx, heads):
    B, C, H, W = x.shape
    res = x
    h = t_gn(s, f"{p}.norm", x, eps=1e-6)
    h = t_conv(s, f"{p}.proj_in", h, pad=0)
    h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
    h = t_tblock(s, f"{p}.transformer_blocks.0", h, ctx, heads)
    h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
    return t_conv(s, f"{p}.proj_out", h, pad=0) + res


def t_timestep_embedding(t, dim):
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = float(t) * freqs
    return _t(np.concatenate([np.cos(args), np.sin(args)])[None, :])


# --------------------------------------------------------------------------
# UNet golden (TINY_UNET architecture)
# --------------------------------------------------------------------------


def build_tiny_unet_state() -> State:
    s = State()
    s.conv("conv_in", 4, 32)
    s.linear("time_embedding.linear_1", 32, 128)
    s.linear("time_embedding.linear_2", 128, 128)

    def resnet(p, cin, cout):
        s.norm(f"{p}.norm1", cin)
        s.conv(f"{p}.conv1", cin, cout)
        s.linear(f"{p}.time_emb_proj", 128, cout)
        s.norm(f"{p}.norm2", cout)
        s.conv(f"{p}.conv2", cout, cout)
        if cin != cout:
            s.conv(f"{p}.conv_shortcut", cin, cout, k=1)

    def transformer(p, c, ctx=32):
        s.norm(f"{p}.norm", c)
        s.conv(f"{p}.proj_in", c, c, k=1)
        tb = f"{p}.transformer_blocks.0"
        s.norm(f"{tb}.norm1", c)
        s.linear(f"{tb}.attn1.to_q", c, c, bias=False)
        s.linear(f"{tb}.attn1.to_k", c, c, bias=False)
        s.linear(f"{tb}.attn1.to_v", c, c, bias=False)
        s.linear(f"{tb}.attn1.to_out.0", c, c)
        s.norm(f"{tb}.norm2", c)
        s.linear(f"{tb}.attn2.to_q", c, c, bias=False)
        s.linear(f"{tb}.attn2.to_k", ctx, c, bias=False)
        s.linear(f"{tb}.attn2.to_v", ctx, c, bias=False)
        s.linear(f"{tb}.attn2.to_out.0", c, c)
        s.norm(f"{tb}.norm3", c)
        s.linear(f"{tb}.ff.net.0.proj", c, 8 * c)
        s.linear(f"{tb}.ff.net.2", 4 * c, c)
        s.conv(f"{p}.proj_out", c, c, k=1)

    resnet("down_blocks.0.resnets.0", 32, 32)
    transformer("down_blocks.0.attentions.0", 32)
    s.conv("down_blocks.0.downsamplers.0.conv", 32, 32)
    resnet("down_blocks.1.resnets.0", 32, 64)

    resnet("mid_block.resnets.0", 64, 64)
    transformer("mid_block.attentions.0", 64)
    resnet("mid_block.resnets.1", 64, 64)

    resnet("up_blocks.0.resnets.0", 128, 64)
    resnet("up_blocks.0.resnets.1", 96, 64)
    s.conv("up_blocks.0.upsamplers.0.conv", 64, 64)
    resnet("up_blocks.1.resnets.0", 96, 32)
    transformer("up_blocks.1.attentions.0", 32)
    resnet("up_blocks.1.resnets.1", 64, 32)
    transformer("up_blocks.1.attentions.1", 32)

    s.norm("conv_norm_out", 32)
    s.conv("conv_out", 32, 4)
    return s


def torch_tiny_unet(s: State, x, t, ctx):
    heads = 2
    temb = t_linear(s, "time_embedding.linear_1", t_timestep_embedding(t, 32))
    temb = t_linear(s, "time_embedding.linear_2", TF.silu(temb))

    h = t_conv(s, "conv_in", x)
    skips = [h]
    h = t_resnet(s, "down_blocks.0.resnets.0", h, temb)
    h = t_transformer2d(s, "down_blocks.0.attentions.0", h, ctx, heads)
    skips.append(h)
    h = t_conv(s, "down_blocks.0.downsamplers.0.conv", h, stride=2)
    skips.append(h)
    h = t_resnet(s, "down_blocks.1.resnets.0", h, temb)
    skips.append(h)

    h = t_resnet(s, "mid_block.resnets.0", h, temb)
    h = t_transformer2d(s, "mid_block.attentions.0", h, ctx, heads)
    h = t_resnet(s, "mid_block.resnets.1", h, temb)

    h = t_resnet(s, "up_blocks.0.resnets.0",
                 torch.cat([h, skips.pop()], 1), temb)
    h = t_resnet(s, "up_blocks.0.resnets.1",
                 torch.cat([h, skips.pop()], 1), temb)
    h = TF.interpolate(h, scale_factor=2, mode="nearest")
    h = t_conv(s, "up_blocks.0.upsamplers.0.conv", h)
    h = t_resnet(s, "up_blocks.1.resnets.0",
                 torch.cat([h, skips.pop()], 1), temb)
    h = t_transformer2d(s, "up_blocks.1.attentions.0", h, ctx, heads)
    h = t_resnet(s, "up_blocks.1.resnets.1",
                 torch.cat([h, skips.pop()], 1), temb)
    h = t_transformer2d(s, "up_blocks.1.attentions.1", h, ctx, heads)

    h = TF.silu(t_gn(s, "conv_norm_out", h))
    return t_conv(s, "conv_out", h)


class TestUNetGolden:
    @pytest.mark.slow
    def test_full_forward_parity(self):
        from vidtome_tpu.models.unet import TINY_UNET, UNet2DConditionModel

        s = build_tiny_unet_state()
        x = RNG.normal(size=(2, 4, 16, 16)).astype(np.float32)
        ctx = RNG.normal(size=(2, 8, 32)).astype(np.float32)
        t = 421

        ref = torch_tiny_unet(s, _t(x), t, _t(ctx)).detach().numpy()

        params = convert.convert_unet(dict(s))
        unet = UNet2DConditionModel(config=TINY_UNET, dtype=jnp.float32)
        out = unet.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(t), jnp.asarray(ctx))
        out = np.asarray(out).transpose(0, 3, 1, 2)

        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)


# --------------------------------------------------------------------------
# VAE golden — encoder uses LEGACY conv-style attention keys, decoder modern
# --------------------------------------------------------------------------


def build_tiny_vae_state() -> State:
    s = State()
    C = (8, 8)

    def resnet(p, cin, cout):
        s.norm(f"{p}.norm1", cin)
        s.conv(f"{p}.conv1", cin, cout)
        s.norm(f"{p}.norm2", cout)
        s.conv(f"{p}.conv2", cout, cout)
        if cin != cout:
            s.conv(f"{p}.conv_shortcut", cin, cout, k=1)

    # encoder (legacy attention: query/key/value/proj_attn as [C, C, 1, 1])
    s.conv("encoder.conv_in", 3, 8)
    resnet("encoder.down_blocks.0.resnets.0", 8, 8)
    s.conv("encoder.down_blocks.0.downsamplers.0.conv", 8, 8)
    resnet("encoder.down_blocks.1.resnets.0", 8, 8)
    resnet("encoder.mid_block.resnets.0", 8, 8)
    s.norm("encoder.mid_block.attentions.0.group_norm", 8)
    for nm in ("query", "key", "value", "proj_attn"):
        s[f"encoder.mid_block.attentions.0.{nm}.weight"] = \
            _w(8, 8)[:, :, None, None]
        s[f"encoder.mid_block.attentions.0.{nm}.bias"] = _w(8)
    resnet("encoder.mid_block.resnets.1", 8, 8)
    s.norm("encoder.conv_norm_out", 8)
    s.conv("encoder.conv_out", 8, 8)  # 2 * latent(4)
    s.conv("quant_conv", 8, 8, k=1)

    # decoder (modern attention keys: to_q/to_k/to_v/to_out.0 as [C, C])
    s.conv("post_quant_conv", 4, 4, k=1)
    s.conv("decoder.conv_in", 4, 8)
    resnet("decoder.mid_block.resnets.0", 8, 8)
    s.norm("decoder.mid_block.attentions.0.group_norm", 8)
    for nm in ("to_q", "to_k", "to_v"):
        s.linear(f"decoder.mid_block.attentions.0.{nm}", 8, 8)
    s.linear("decoder.mid_block.attentions.0.to_out.0", 8, 8)
    resnet("decoder.mid_block.resnets.1", 8, 8)
    resnet("decoder.up_blocks.0.resnets.0", 8, 8)
    resnet("decoder.up_blocks.0.resnets.1", 8, 8)
    s.conv("decoder.up_blocks.0.upsamplers.0.conv", 8, 8)
    resnet("decoder.up_blocks.1.resnets.0", 8, 8)
    resnet("decoder.up_blocks.1.resnets.1", 8, 8)
    s.norm("decoder.conv_norm_out", 8)
    s.conv("decoder.conv_out", 8, 3)
    return s


def t_vae_resnet(s, p, x):
    h = t_conv(s, f"{p}.conv1", TF.silu(t_gn(s, f"{p}.norm1", x)))
    h = t_conv(s, f"{p}.conv2", TF.silu(t_gn(s, f"{p}.norm2", h)))
    if f"{p}.conv_shortcut.weight" in s:
        x = t_conv(s, f"{p}.conv_shortcut", x, pad=0)
    return x + h


def t_vae_attn(s, p, x, legacy):
    B, C, H, W = x.shape
    h = t_gn(s, f"{p}.group_norm", x)
    h = h.reshape(B, C, H * W).transpose(1, 2)  # [B, HW, C]
    names = (("query", "key", "value", "proj_attn") if legacy
             else ("to_q", "to_k", "to_v", "to_out.0"))

    def lin(nm, v):
        w = _t(s[f"{p}.{nm}.weight"])
        if w.ndim == 4:
            w = w.reshape(w.shape[0], w.shape[1])
        return TF.linear(v, w, _t(s[f"{p}.{nm}.bias"]))

    q, k, v = lin(names[0], h), lin(names[1], h), lin(names[2], h)
    scores = q @ k.transpose(-1, -2) / math.sqrt(C)
    out = torch.softmax(scores, dim=-1) @ v
    out = lin(names[3], out)
    return x + out.transpose(1, 2).reshape(B, C, H, W)


def torch_tiny_vae_encode(s, x):
    h = t_conv(s, "encoder.conv_in", x)
    h = t_vae_resnet(s, "encoder.down_blocks.0.resnets.0", h)
    h = TF.pad(h, (0, 1, 0, 1))
    h = t_conv(s, "encoder.down_blocks.0.downsamplers.0.conv", h,
               stride=2, pad=0)
    h = t_vae_resnet(s, "encoder.down_blocks.1.resnets.0", h)
    h = t_vae_resnet(s, "encoder.mid_block.resnets.0", h)
    h = t_vae_attn(s, "encoder.mid_block.attentions.0", h, legacy=True)
    h = t_vae_resnet(s, "encoder.mid_block.resnets.1", h)
    h = TF.silu(t_gn(s, "encoder.conv_norm_out", h))
    moments = t_conv(s, "quant_conv", t_conv(s, "encoder.conv_out", h), pad=0)
    return moments[:, :4] * 0.18215


def torch_tiny_vae_decode(s, z):
    h = t_conv(s, "post_quant_conv", z / 0.18215, pad=0)
    h = t_conv(s, "decoder.conv_in", h)
    h = t_vae_resnet(s, "decoder.mid_block.resnets.0", h)
    h = t_vae_attn(s, "decoder.mid_block.attentions.0", h, legacy=False)
    h = t_vae_resnet(s, "decoder.mid_block.resnets.1", h)
    h = t_vae_resnet(s, "decoder.up_blocks.0.resnets.0", h)
    h = t_vae_resnet(s, "decoder.up_blocks.0.resnets.1", h)
    h = TF.interpolate(h, scale_factor=2, mode="nearest")
    h = t_conv(s, "decoder.up_blocks.0.upsamplers.0.conv", h)
    h = t_vae_resnet(s, "decoder.up_blocks.1.resnets.0", h)
    h = t_vae_resnet(s, "decoder.up_blocks.1.resnets.1", h)
    h = TF.silu(t_gn(s, "decoder.conv_norm_out", h))
    h = t_conv(s, "decoder.conv_out", h)
    return torch.clamp(h / 2 + 0.5, 0.0, 1.0)


class TestVAEGolden:
    def test_encode_decode_parity(self):
        from vidtome_tpu.models.vae import AutoencoderKL

        s = build_tiny_vae_state()
        x = RNG.normal(size=(2, 3, 16, 16)).astype(np.float32) * 0.5

        lat_ref = torch_tiny_vae_encode(s, _t(x)).detach().numpy()
        img_ref = torch_tiny_vae_decode(s, _t(lat_ref)).detach().numpy()

        params = convert.convert_vae(dict(s))
        vae = AutoencoderKL(block_out_channels=(8, 8), layers_per_block=1,
                            dtype=jnp.float32)
        lat = vae.apply({"params": params},
                        jnp.asarray(x.transpose(0, 2, 3, 1)),
                        method=AutoencoderKL.encode)
        np.testing.assert_allclose(
            np.asarray(lat).transpose(0, 3, 1, 2), lat_ref,
            atol=2e-4, rtol=2e-3)

        img = vae.apply({"params": params}, lat, method=AutoencoderKL.decode)
        np.testing.assert_allclose(
            np.asarray(img).transpose(0, 3, 1, 2), img_ref,
            atol=2e-4, rtol=2e-3)


# --------------------------------------------------------------------------
# CLIP text encoder golden
# --------------------------------------------------------------------------


def build_tiny_text_state(vocab=50, hidden=32, layers=2, inter=64,
                          maxpos=16) -> State:
    s = State()
    s["text_model.embeddings.token_embedding.weight"] = _w(vocab, hidden,
                                                           scale=0.3)
    s["text_model.embeddings.position_embedding.weight"] = _w(maxpos, hidden,
                                                              scale=0.05)
    s["text_model.embeddings.position_ids"] = np.arange(maxpos)[None]
    for i in range(layers):
        p = f"text_model.encoder.layers.{i}"
        s.norm(f"{p}.layer_norm1", hidden)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            s.linear(f"{p}.self_attn.{nm}", hidden, hidden)
        s.norm(f"{p}.layer_norm2", hidden)
        s.linear(f"{p}.mlp.fc1", hidden, inter)
        s.linear(f"{p}.mlp.fc2", inter, hidden)
    s.norm("text_model.final_layer_norm", hidden)
    return s


def torch_tiny_text(s, ids, layers=2, heads=2):
    B, S = ids.shape
    x = _t(s["text_model.embeddings.token_embedding.weight"])[ids]
    x = x + _t(s["text_model.embeddings.position_embedding.weight"])[:S]
    mask = torch.tril(torch.ones(S, S, dtype=torch.bool))
    for i in range(layers):
        p = f"text_model.encoder.layers.{i}"
        h = t_ln(s, f"{p}.layer_norm1", x)
        C = h.shape[-1]
        D = C // heads

        def split(t):
            return t.reshape(B, S, heads, D).transpose(1, 2)

        q = split(t_linear(s, f"{p}.self_attn.q_proj", h)) / math.sqrt(D)
        k = split(t_linear(s, f"{p}.self_attn.k_proj", h))
        v = split(t_linear(s, f"{p}.self_attn.v_proj", h))
        scores = (q @ k.transpose(-1, -2)).masked_fill(
            ~mask, torch.finfo(torch.float32).min)
        out = (torch.softmax(scores, -1) @ v).transpose(1, 2).reshape(B, S, C)
        x = x + t_linear(s, f"{p}.self_attn.out_proj", out)
        h = t_ln(s, f"{p}.layer_norm2", x)
        h = t_linear(s, f"{p}.mlp.fc1", h)
        h = h * torch.sigmoid(1.702 * h)  # quick_gelu
        x = x + t_linear(s, f"{p}.mlp.fc2", h)
    return t_ln(s, "text_model.final_layer_norm", x)


class TestTextGolden:
    def test_forward_parity(self):
        from vidtome_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel

        s = build_tiny_text_state()
        ids = RNG.integers(0, 50, size=(2, 16))
        ref = torch_tiny_text(s, torch.tensor(ids)).detach().numpy()

        params = convert.convert_text_encoder(dict(s))
        cfg = CLIPTextConfig(vocab_size=50, hidden_size=32, num_layers=2,
                             num_heads=2, intermediate_size=64,
                             max_positions=16)
        model = CLIPTextModel(cfg=cfg)
        out = model.apply({"params": params}, jnp.asarray(ids, jnp.int32))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-3)


# --------------------------------------------------------------------------
# Round trip through an actual safetensors file (the full load path)
# --------------------------------------------------------------------------


class TestSafetensorsRoundTrip:
    @pytest.mark.slow
    def test_unet_through_file(self, tmp_path):
        from safetensors.numpy import save_file

        from vidtome_tpu.models.unet import TINY_UNET, UNet2DConditionModel

        s = build_tiny_unet_state()
        d = tmp_path / "unet"
        d.mkdir()
        save_file(dict(s), str(d / "diffusion_pytorch_model.safetensors"))

        state = convert.load_component_state(str(tmp_path), "unet")
        assert set(state) == set(s)
        params = convert.convert_unet(state)
        unet = UNet2DConditionModel(config=TINY_UNET, dtype=jnp.float32)
        x = RNG.normal(size=(1, 8, 8, 4)).astype(np.float32)
        ctx = RNG.normal(size=(1, 8, 32)).astype(np.float32)
        out = unet.apply({"params": params}, jnp.asarray(x), jnp.asarray(3),
                         jnp.asarray(ctx))
        assert np.isfinite(np.asarray(out)).all()
