"""Pipeline-level golden parity vs a torch oracle (the PSNR>=35 proxy).

Extends the per-layer golden tests (test_convert_golden.py) to the FULL
edit flow the reference runs (`/root/reference/run_vidtome.py:5-21`):
VAE-encode -> DDIM inversion -> latent cache -> CFG DDIM generation ->
VAE decode, on a tiny real-key-layout checkpoint loaded through
models/convert.py.  The oracle re-implements the reference's pipeline
semantics (invert.py:181-211, generate.py:238-311) in torch/numpy:
per-frame UNet eps, single-cond inversion, [uncond; cond] CFG combine,
closed-form DDIM updates.  Any drift in scheduler step math, VAE scaling,
CFG order, cache round-trip, or layer semantics shows up as a PSNR drop
here, not just a per-layer delta.

Alpha-bar tables are taken from our DDIMScheduler (their construction is
oracle-tested separately in test_scheduler.py); the *step updates* that
consume them are written out independently below.

Two configurations mirror BASELINE.md's fidelity ladder:
  * merging disabled (max_downsample: 0) — pure SD edit parity;
  * merging active at ratio 0 — the merge machinery must be an exact
    no-op apart from joining frames into one self-attention sequence,
    which the oracle replicates by reshaping (B F) N C -> B (F N) C
    around attn1 (reference vidtome/utils.py join_frame).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.helpers import make_tiny_bundle, make_tiny_video  # noqa: E402
from tests.test_convert_golden import (_t, build_tiny_unet_state,  # noqa: E402
                                       build_tiny_vae_state, t_conv, t_gn,
                                       t_linear, t_ln, t_mha, t_resnet,
                                       t_timestep_embedding,
                                       torch_tiny_vae_decode,
                                       torch_tiny_vae_encode)
from vidtome_tpu.config import Config  # noqa: E402
from vidtome_tpu.core.scheduler import DDIMScheduler  # noqa: E402
from vidtome_tpu.models import convert  # noqa: E402

import torch.nn.functional as TF  # noqa: E402

pytestmark = pytest.mark.slow

STEPS = 4
GUIDANCE = 7.5
N_FRAMES = 4


def psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    return 99.0 if mse == 0 else 10.0 * np.log10(1.0 / mse)


# ---------------------------------------------------------------- oracle


def t_tblock_joined(s, p, x, ctx, heads, frames):
    """Transformer block with frames joined for self-attention — what the
    merge path reduces to at ratio 0 (join -> attn1 over B (F N) C ->
    split; attn2/ff unmerged)."""
    BF, N, C = x.shape
    B = BF // frames
    h = t_ln(s, f"{p}.norm1", x)
    hj = h.reshape(B, frames * N, C)
    a = t_mha(s, f"{p}.attn1", hj, hj, heads).reshape(BF, N, C)
    x = x + a
    x = x + t_mha(s, f"{p}.attn2", t_ln(s, f"{p}.norm2", x), ctx, heads)
    h = t_linear(s, f"{p}.ff.net.0.proj", t_ln(s, f"{p}.norm3", x))
    h, gate = h.chunk(2, dim=-1)
    h = h * TF.gelu(gate)
    return x + t_linear(s, f"{p}.ff.net.2", h)


def t_transformer2d_j(s, p, x, ctx, heads, frames):
    B, C, H, W = x.shape
    res = x
    h = t_gn(s, f"{p}.norm", x, eps=1e-6)
    h = t_conv(s, f"{p}.proj_in", h, pad=0)
    h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
    if frames:
        h = t_tblock_joined(s, f"{p}.transformer_blocks.0", h, ctx, heads,
                            frames)
    else:
        from tests.test_convert_golden import t_tblock

        h = t_tblock(s, f"{p}.transformer_blocks.0", h, ctx, heads)
    h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
    return t_conv(s, f"{p}.proj_out", h, pad=0) + res


def torch_unet(s, x, t, ctx, frames=0):
    """TINY_UNET oracle forward; ``frames`` > 0 joins frames in attn1."""
    heads = 2
    temb = t_linear(s, "time_embedding.linear_1",
                    t_timestep_embedding(t, 32))
    temb = t_linear(s, "time_embedding.linear_2", TF.silu(temb))

    h = t_conv(s, "conv_in", x)
    skips = [h]
    h = t_resnet(s, "down_blocks.0.resnets.0", h, temb)
    h = t_transformer2d_j(s, "down_blocks.0.attentions.0", h, ctx, heads,
                          frames)
    skips.append(h)
    h = t_conv(s, "down_blocks.0.downsamplers.0.conv", h, stride=2)
    skips.append(h)
    h = t_resnet(s, "down_blocks.1.resnets.0", h, temb)
    skips.append(h)

    h = t_resnet(s, "mid_block.resnets.0", h, temb)
    h = t_transformer2d_j(s, "mid_block.attentions.0", h, ctx, heads,
                          frames)
    h = t_resnet(s, "mid_block.resnets.1", h, temb)

    h = t_resnet(s, "up_blocks.0.resnets.0",
                 torch.cat([h, skips.pop()], 1), temb)
    h = t_resnet(s, "up_blocks.0.resnets.1",
                 torch.cat([h, skips.pop()], 1), temb)
    h = TF.interpolate(h, scale_factor=2, mode="nearest")
    h = t_conv(s, "up_blocks.0.upsamplers.0.conv", h)
    h = t_resnet(s, "up_blocks.1.resnets.0",
                 torch.cat([h, skips.pop()], 1), temb)
    h = t_transformer2d_j(s, "up_blocks.1.attentions.0", h, ctx, heads,
                          frames)
    h = t_resnet(s, "up_blocks.1.resnets.1",
                 torch.cat([h, skips.pop()], 1), temb)
    h = t_transformer2d_j(s, "up_blocks.1.attentions.1", h, ctx, heads,
                          frames)

    h = TF.silu(t_gn(s, "conv_norm_out", h))
    return t_conv(s, "conv_out", h)


def oracle_edit(unet_state, vae_state, frames01, ctx_inv, ctx_uncond,
                ctx_cond, joined_frames=0):
    """Full reference-semantics edit in torch: encode -> invert ->
    CFG-sample -> decode.  frames01: [F, H, W, 3] in [0, 1]."""
    sch = DDIMScheduler.create(STEPS)
    x_img = _t(np.transpose(frames01, (0, 3, 1, 2))) * 2 - 1
    lat = torch_tiny_vae_encode(vae_state, x_img)  # scaled latents, NCHW

    F = lat.shape[0]
    ts_up = sch.timesteps[::-1]
    acp = sch.alphas_cumprod
    with torch.no_grad():
        # DDIM inversion (reference invert.py:181-211): single cond
        # context, x0 reconstructed under the previous (less noisy)
        # alpha-bar, renoised under the current one.
        x = lat
        for i, t in enumerate(ts_up):
            a_t = float(acp[t])
            a_prev = (sch.final_alpha_cumprod if i == 0
                      else float(acp[ts_up[i - 1]]))
            # inversion always runs the unpatched per-frame UNet —
            # merging applies only during generation (reference
            # generate.py:96-98 patches after inversion)
            eps = torch_unet(unet_state, x, int(t), _t(ctx_inv), frames=0)
            x0 = (x - np.sqrt(1 - a_prev) * eps) / np.sqrt(a_prev)
            x = np.sqrt(a_t) * x0 + np.sqrt(1 - a_t) * eps

        # CFG generation (reference generate.py:238-311).
        for i, t in enumerate(sch.timesteps):
            a_t = float(acp[t])
            a_prev = (float(acp[sch.timesteps[i + 1]])
                      if i + 1 < len(sch.timesteps)
                      else sch.final_alpha_cumprod)
            e_u = torch_unet(unet_state, x, int(t),
                             _t(ctx_uncond), frames=joined_frames)
            e_c = torch_unet(unet_state, x, int(t),
                             _t(ctx_cond), frames=joined_frames)
            eps = e_u + GUIDANCE * (e_c - e_u)
            x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
            x = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps

        out = torch_tiny_vae_decode(vae_state, x)
    return np.transpose(out.numpy(), (0, 2, 3, 1))  # [F, H, W, 3]


# -------------------------------------------------------------- fixture


@pytest.fixture(scope="module")
def golden_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden")
    unet_state = build_tiny_unet_state()
    vae_state = build_tiny_vae_state()

    bundle = make_tiny_bundle()  # supplies text model + tokenizer
    bundle.unet_params = convert.convert_unet(dict(unet_state))
    bundle.vae_params = convert.convert_vae(dict(vae_state))
    bundle.vae_channels = ((8, 8), 1)  # match the golden VAE (2 levels)

    video_dir = make_tiny_video(str(tmp / "frames"), n_frames=N_FRAMES,
                                size=64)
    return bundle, unet_state, vae_state, video_dir, str(tmp)


def _pipeline_config(tmp, video_dir, **gene_overrides):
    gene = {
        "control": "none", "guidance_scale": GUIDANCE,
        "n_timesteps": STEPS, "negative_prompt": "blurry",
        "prompt": {"edit": "an oil painting"},
        "latents_path": os.path.join(tmp, "latents"),
        "output_path": os.path.join(tmp, "out"),
        "chunk_size": N_FRAMES, "chunk_ord": "seq",
        "local_merge_ratio": 0.0, "merge_global": False,
        "global_merge_ratio": 0.8, "global_rand": 0.5,
        "align_batch": False, "save_frame": False,
        "max_downsample": 0,  # default: merging fully off
    }
    gene.update(gene_overrides)
    return Config({
        "sd_version": "1.5", "input_path": video_dir, "work_dir": tmp,
        "height": 64, "width": 64, "seed": 7, "float_precision": "fp32",
        "inversion": {
            "save_path": os.path.join(tmp, "latents"),
            "prompt": "a colorful gradient", "steps": STEPS,
            "save_steps": STEPS, "save_intermediate": False,
            "batch_size": N_FRAMES, "n_frames": None, "force": True,
            "recon": False, "control": "none", "control_scale": 1.0,
        },
        "generation": gene,
    })


def _run_pair(golden_setup, tmp_path, joined: bool):
    from vidtome_tpu.io.video import load_video
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.pipeline.inverter import Inverter

    bundle, unet_state, vae_state, video_dir, _ = golden_setup
    tmp = str(tmp_path)
    if joined:
        # merging active but a ratio-0 no-op: attention sees the joined
        # frame sequence, nothing is merged away
        cfg = _pipeline_config(tmp, video_dir, max_downsample=2,
                               local_merge_ratio=0.0, len_quantum=None)
    else:
        cfg = _pipeline_config(tmp, video_dir)

    inv = Inverter(bundle, cfg, use_pallas=False)
    inv(video_dir, cfg.inversion.save_path)
    gen = Generator(bundle, cfg, use_pallas=False)
    ours = gen(video_dir, cfg.inversion.save_path,
               cfg.generation.output_path,
               frame_ids=list(range(N_FRAMES)))["edit"]

    frames01 = np.asarray(load_video(video_dir, 64, 64), np.float32)
    ctx_inv = np.asarray(inv.text(["a colorful gradient"] * N_FRAMES),
                         np.float32)
    cfg_ctx = np.asarray(gen.text.embed_cfg("an oil painting", "blurry"),
                         np.float32)
    ctx_u = np.repeat(cfg_ctx[0:1], N_FRAMES, axis=0)
    ctx_c = np.repeat(cfg_ctx[1:2], N_FRAMES, axis=0)
    ref = oracle_edit(unet_state, vae_state, frames01, ctx_inv, ctx_u,
                      ctx_c, joined_frames=N_FRAMES if joined else 0)
    return np.asarray(ours, np.float32), ref


class TestPipelineGolden:
    def test_edit_psnr_no_merge(self, golden_setup, tmp_path):
        ours, ref = _run_pair(golden_setup, tmp_path, joined=False)
        assert ours.shape == ref.shape
        p = psnr(ours, ref)
        print(f"[golden] pipeline PSNR (merge off): {p:.1f} dB")
        assert p >= 35.0, f"pipeline drifted from torch oracle: {p:.1f} dB"

    def test_edit_psnr_ratio0_merge(self, golden_setup, tmp_path):
        ours, ref = _run_pair(golden_setup, tmp_path, joined=True)
        p = psnr(ours, ref)
        print(f"[golden] pipeline PSNR (ratio-0 merge): {p:.1f} dB")
        assert p >= 35.0, f"ratio-0 merge is not a no-op: {p:.1f} dB"
