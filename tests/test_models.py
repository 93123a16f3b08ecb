"""Model stack tests: tiny UNet/VAE/CLIP forwards, merge integration, PnP
flags, torch layer parity for the converter's layout conventions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidtome_tpu.models.clip_text import TINY_TEXT, CLIPTextModel
from vidtome_tpu.models.tome import ToMeCall, ToMeConfig
from vidtome_tpu.models.unet import TINY_UNET, UNet2DConditionModel
from vidtome_tpu.models.vae import AutoencoderKL


@pytest.fixture(scope="module")
def tiny_unet():
    model = UNet2DConditionModel(config=TINY_UNET, dtype=jnp.float32,
                                 use_pallas=False)
    x = jnp.zeros((2, 16, 16, 4))
    ctx = jnp.zeros((2, 8, 32))
    params = model.init(jax.random.key(0), x, jnp.asarray(0), ctx)
    return model, params


class TestUNet:
    def test_output_shape(self, tiny_unet):
        model, params = tiny_unet
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(2), (2, 8, 32))
        out = model.apply(params, x, jnp.asarray(10), ctx)
        assert out.shape == (2, 16, 16, 4)
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.slow
    def test_timestep_changes_output(self, tiny_unet):
        model, params = tiny_unet
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(2), (1, 8, 32))
        a = model.apply(params, x, jnp.asarray(10), ctx)
        b = model.apply(params, x, jnp.asarray(500), ctx)
        assert np.abs(np.asarray(a - b)).max() > 1e-4

    @pytest.mark.slow
    def test_merging_active_changes_output_but_not_shape(self, tiny_unet):
        _, params = tiny_unet
        tome = ToMeConfig(frames=4, local_merge_ratio=0.9)
        model_m = UNet2DConditionModel(config=TINY_UNET, tome=tome,
                                       dtype=jnp.float32, use_pallas=False)
        x = jax.random.normal(jax.random.key(3), (8, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(4), (8, 8, 32))
        call = ToMeCall(key=jax.random.key(5), bank_mode="off")
        out_m = model_m.apply(params, x, jnp.asarray(10), ctx,
                              tome_call=call, num_lanes=2)
        out_p = model_m.apply(params, x, jnp.asarray(10), ctx,
                              tome_call=None, num_lanes=2)
        assert out_m.shape == out_p.shape == (8, 16, 16, 4)
        assert np.abs(np.asarray(out_m - out_p)).max() > 1e-5

    @pytest.mark.slow
    def test_merging_identical_frames_matches_unmerged(self, tiny_unet):
        """With identical frames and ratio=1.0, replace-mode merging reduces
        the joined sequence to exactly one frame's tokens, so the merged
        forward must equal the unmerged forward.  (At ratio < 1 the merged
        multiset keeps unmerged-src duplicates that shift softmax mass — the
        reference behaves identically, so exactness holds only at 1.0.)"""
        _, params = tiny_unet
        tome = ToMeConfig(frames=4, local_merge_ratio=1.0)
        model_m = UNet2DConditionModel(config=TINY_UNET, tome=tome,
                                       dtype=jnp.float32, use_pallas=False)
        frame = jax.random.normal(jax.random.key(6), (1, 16, 16, 4))
        x = jnp.tile(frame, (4, 1, 1, 1))
        ctx = jnp.tile(jax.random.normal(jax.random.key(7), (1, 8, 32)),
                       (4, 1, 1))
        call = ToMeCall(key=jax.random.key(8), bank_mode="off")
        out_m = model_m.apply(params, x, jnp.asarray(10), ctx,
                              tome_call=call, num_lanes=1)
        out_p = model_m.apply(params, x, jnp.asarray(10), ctx, tome_call=None)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_p),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.slow
    def test_share_match_runs_and_is_exact_for_identical_frames(self, tiny_unet):
        """share_match reuses one matching per level; with identical frames
        at ratio 1.0 both modes are exact, so outputs must agree."""
        _, params = tiny_unet
        frame = jax.random.normal(jax.random.key(20), (1, 16, 16, 4))
        x = jnp.tile(frame, (4, 1, 1, 1))
        ctx = jnp.tile(jax.random.normal(jax.random.key(21), (1, 8, 32)),
                       (4, 1, 1))
        outs = {}
        for shared in (False, True):
            tome = ToMeConfig(frames=4, local_merge_ratio=1.0,
                              share_match=shared)
            model = UNet2DConditionModel(config=TINY_UNET, tome=tome,
                                         dtype=jnp.float32, use_pallas=False)
            outs[shared] = model.apply(
                params, x, jnp.asarray(10), ctx,
                tome_call=ToMeCall(key=jax.random.key(22), bank_mode="off"),
                num_lanes=1)
        np.testing.assert_allclose(np.asarray(outs[True]),
                                   np.asarray(outs[False]),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.slow
    def test_share_match_with_global_bank(self, tiny_unet):
        _, params = tiny_unet
        tome = ToMeConfig(frames=4, local_merge_ratio=0.9, merge_global=True,
                          share_match=True)
        model = UNet2DConditionModel(config=TINY_UNET, tome=tome,
                                     dtype=jnp.float32, use_pallas=False)
        x = jax.random.normal(jax.random.key(23), (8, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(24), (8, 8, 32))
        out1, v1 = model.apply(
            params, x, jnp.asarray(10), ctx,
            tome_call=ToMeCall(key=jax.random.key(25), bank_mode="init"),
            num_lanes=2, mutable=["tome_bank"])
        out2, _ = model.apply(
            {**params, **v1}, x, jnp.asarray(10), ctx,
            tome_call=ToMeCall(key=jax.random.key(26), bank_mode="merge"),
            num_lanes=2, mutable=["tome_bank"])
        assert np.isfinite(np.asarray(out1)).all()
        assert np.isfinite(np.asarray(out2)).all()

    @pytest.mark.slow
    def test_global_bank_lifecycle(self, tiny_unet):
        _, params = tiny_unet
        tome = ToMeConfig(frames=2, local_merge_ratio=0.9, merge_global=True)
        model_m = UNet2DConditionModel(config=TINY_UNET, tome=tome,
                                       dtype=jnp.float32, use_pallas=False)
        x = jax.random.normal(jax.random.key(9), (4, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(10), (4, 8, 32))
        out1, v1 = model_m.apply(
            params, x, jnp.asarray(10), ctx,
            tome_call=ToMeCall(key=jax.random.key(11), bank_mode="init"),
            num_lanes=2, mutable=["tome_bank"])
        assert "tome_bank" in v1
        out2, v2 = model_m.apply(
            {**params, **v1}, x, jnp.asarray(10), ctx,
            tome_call=ToMeCall(key=jax.random.key(12), bank_mode="merge"),
            num_lanes=2, mutable=["tome_bank"])
        # banks must actually update between chunks
        leaves1 = jax.tree.leaves(v1["tome_bank"])
        leaves2 = jax.tree.leaves(v2["tome_bank"])
        assert any(np.abs(np.asarray(a - b)).max() > 1e-6
                   for a, b in zip(leaves1, leaves2))

    @pytest.mark.slow
    def test_pnp_injection_flags(self, tiny_unet):
        model, params = tiny_unet
        x = jax.random.normal(jax.random.key(13), (6, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(14), (6, 8, 32))
        base = model.apply(params, x, jnp.asarray(10), ctx,
                           attn_inject=jnp.asarray(False),
                           conv_inject=jnp.asarray(False), num_lanes=3)
        plain = model.apply(params, x, jnp.asarray(10), ctx)
        np.testing.assert_allclose(np.asarray(base), np.asarray(plain),
                                   rtol=1e-5, atol=1e-5)
        injected = model.apply(params, x, jnp.asarray(10), ctx,
                               attn_inject=jnp.asarray(True),
                               conv_inject=jnp.asarray(True), num_lanes=3)
        assert np.abs(np.asarray(injected - base)).max() > 1e-5

    def test_controlnet_residual_inputs(self, tiny_unet):
        model, params = tiny_unet
        x = jnp.zeros((1, 16, 16, 4))
        ctx = jnp.zeros((1, 8, 32))
        # tiny config skip count: 1 + (1+1) + 1 = ... computed from structure
        base = model.apply(params, x, jnp.asarray(0), ctx)
        chans = [32, 32, 32, 64, 64]  # conv_in, l0(res+attn), down, l1
        down_res = [jnp.ones((1, 16, 16, 32)), jnp.ones((1, 16, 16, 32)),
                    jnp.ones((1, 8, 8, 32)), jnp.ones((1, 8, 8, 64))]
        mid_res = jnp.ones((1, 8, 8, 64))
        out = model.apply(params, x, jnp.asarray(0), ctx,
                          down_residuals=down_res, mid_residual=mid_res)
        assert out.shape == base.shape
        assert np.abs(np.asarray(out - base)).max() > 1e-5


class TestSDXLUNet:
    @pytest.mark.slow
    def test_forward_with_addition_embeds_and_merging(self):
        from vidtome_tpu.models.unet import TINY_SDXL_UNET

        tome = ToMeConfig(frames=4, local_merge_ratio=0.9)
        model = UNet2DConditionModel(config=TINY_SDXL_UNET, tome=tome,
                                     dtype=jnp.float32, use_pallas=False)
        x = jax.random.normal(jax.random.key(0), (8, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(1), (8, 8, 32))
        pooled = jax.random.normal(jax.random.key(2), (8, 16))
        time_ids = jnp.tile(jnp.asarray([[512., 512., 0., 0., 512., 512.]]),
                            (8, 1))
        call = ToMeCall(key=jax.random.key(3), bank_mode="off")
        params = model.init(jax.random.key(4), x, jnp.asarray(0), ctx,
                            tome_call=call, num_lanes=2,
                            add_text_embeds=pooled, add_time_ids=time_ids)
        out = model.apply(params, x, jnp.asarray(10), ctx, tome_call=call,
                          num_lanes=2, add_text_embeds=pooled,
                          add_time_ids=time_ids)
        assert out.shape == (8, 16, 16, 4)
        assert np.isfinite(np.asarray(out)).all()
        # micro-conditioning must influence the output
        out2 = model.apply(params, x, jnp.asarray(10), ctx, tome_call=call,
                           num_lanes=2, add_text_embeds=pooled * 2,
                           add_time_ids=time_ids)
        assert np.abs(np.asarray(out - out2)).max() > 1e-5
        # per-level transformer depth: level 1 has depth 2
        p = params["params"]
        assert "transformer_blocks_1" in p["down_1_attentions_0"]
        assert "down_0_attentions_0" not in p  # level 0 has no attention


class TestVAE:
    def test_encode_decode_shapes(self):
        vae = AutoencoderKL(block_out_channels=(16, 32), layers_per_block=1,
                            dtype=jnp.float32)
        imgs = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3)) * 2 - 1
        params = vae.init(jax.random.key(1), imgs)
        lat = vae.apply(params, imgs, method=AutoencoderKL.encode)
        assert lat.shape == (2, 16, 16, 4)  # one downsample for 2 blocks
        out = vae.apply(params, lat, method=AutoencoderKL.decode)
        assert out.shape == (2, 32, 32, 3)
        assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


class TestCLIPText:
    def test_shapes_and_causality(self):
        model = CLIPTextModel(cfg=TINY_TEXT)
        ids = jnp.asarray(np.random.default_rng(0).integers(
            0, 1000, (2, 16)), jnp.int32)
        params = model.init(jax.random.key(0), ids)
        out = model.apply(params, ids)
        assert out.shape == (2, 16, 32)
        # causality: changing token 10 must not affect positions < 10
        ids2 = ids.at[:, 10].set((ids[:, 10] + 1) % 1000)
        out2 = model.apply(params, ids2)
        np.testing.assert_allclose(np.asarray(out[:, :10]),
                                   np.asarray(out2[:, :10]),
                                   rtol=1e-5, atol=1e-6)
        assert np.abs(np.asarray(out[:, 10:] - out2[:, 10:])).max() > 1e-5


class TestTorchLayerParity:
    """Validate the converter's layout conventions against torch ops."""

    def test_conv_kernel_layout(self):
        import torch

        rng = np.random.default_rng(0)
        w = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)  # OIHW
        b = rng.standard_normal(8).astype(np.float32)
        x = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)  # NCHW
        ref = torch.nn.functional.conv2d(
            torch.tensor(x), torch.tensor(w), torch.tensor(b), padding=1
        ).numpy()

        import flax.linen as nn

        conv = nn.Conv(8, (3, 3), padding=1)
        params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                             "bias": jnp.asarray(b)}}
        got = conv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   ref, rtol=1e-4, atol=1e-4)

    def test_linear_layout(self):
        import torch

        rng = np.random.default_rng(1)
        w = rng.standard_normal((8, 4)).astype(np.float32)  # [out, in]
        b = rng.standard_normal(8).astype(np.float32)
        x = rng.standard_normal((3, 4)).astype(np.float32)
        ref = torch.nn.functional.linear(
            torch.tensor(x), torch.tensor(w), torch.tensor(b)).numpy()

        import flax.linen as nn

        dense = nn.Dense(8)
        params = {"params": {"kernel": jnp.asarray(w.T),
                             "bias": jnp.asarray(b)}}
        got = dense.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)

    def test_groupnorm_layout(self):
        import torch

        rng = np.random.default_rng(2)
        C = 8
        w = rng.standard_normal(C).astype(np.float32)
        b = rng.standard_normal(C).astype(np.float32)
        x = rng.standard_normal((2, C, 4, 4)).astype(np.float32)
        ref = torch.nn.functional.group_norm(
            torch.tensor(x), 4, torch.tensor(w), torch.tensor(b), eps=1e-5
        ).numpy()

        import flax.linen as nn

        gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
        params = {"params": {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}}
        got = gn.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   ref, rtol=1e-4, atol=1e-4)


class TestConverterRewrites:
    def test_unet_key_rewrites(self):
        from vidtome_tpu.models.convert import convert_unet

        rng = np.random.default_rng(3)
        state = {
            "conv_in.weight": rng.standard_normal((32, 4, 3, 3)).astype(np.float32),
            "conv_in.bias": np.zeros(32, np.float32),
            "down_blocks.0.resnets.0.norm1.weight": np.ones(32, np.float32),
            "down_blocks.0.resnets.0.conv1.weight":
                rng.standard_normal((32, 32, 3, 3)).astype(np.float32),
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight":
                rng.standard_normal((32, 32)).astype(np.float32),
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0.weight":
                rng.standard_normal((32, 32)).astype(np.float32),
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight":
                rng.standard_normal((256, 32)).astype(np.float32),
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight":
                rng.standard_normal((32, 128)).astype(np.float32),
            "mid_block.resnets.1.time_emb_proj.weight":
                rng.standard_normal((32, 128)).astype(np.float32),
            "up_blocks.1.upsamplers.0.conv.weight":
                rng.standard_normal((32, 32, 3, 3)).astype(np.float32),
        }
        tree = convert_unet(state)
        assert tree["conv_in"]["kernel"].shape == (3, 3, 4, 32)
        assert tree["down_0_resnets_0"]["norm1"]["scale"].shape == (32,)
        tb = tree["down_0_attentions_0"]["transformer_blocks_0"]
        assert tb["attn1"]["to_q"]["kernel"].shape == (32, 32)
        assert "to_out" in tb["attn1"]
        assert tb["ff"]["proj_in"]["kernel"].shape == (32, 256)
        assert tb["ff"]["proj_out"]["kernel"].shape == (128, 32)
        assert tree["mid_resnets_1"]["time_emb_proj"]["kernel"].shape == (128, 32)
        assert tree["up_1_upsample"]["conv"]["kernel"].shape == (3, 3, 32, 32)

    def test_legacy_vae_attention_conversion(self):
        """Regression: legacy conv-style [C, C, 1, 1] VAE attention weights
        must convert to [in, out] dense kernels without crashing."""
        from vidtome_tpu.models.convert import convert_vae

        rng = np.random.default_rng(7)
        C = 16
        w = rng.standard_normal((C, C, 1, 1)).astype(np.float32)
        state = {
            "encoder.mid_block.attentions.0.query.weight": w,
            "encoder.mid_block.attentions.0.query.bias":
                np.zeros(C, np.float32),
        }
        tree = convert_vae(state)
        kernel = tree["encoder"]["mid_attn"]["to_q"]["kernel"]
        assert kernel.shape == (C, C)
        np.testing.assert_allclose(kernel, w[:, :, 0, 0].T)

    def test_text_encoder_rewrites(self):
        from vidtome_tpu.models.convert import convert_text_encoder

        rng = np.random.default_rng(4)
        state = {
            "text_model.embeddings.token_embedding.weight":
                rng.standard_normal((100, 32)).astype(np.float32),
            "text_model.embeddings.position_embedding.weight":
                rng.standard_normal((77, 32)).astype(np.float32),
            "text_model.embeddings.position_ids": np.arange(77)[None],
            "text_model.encoder.layers.0.self_attn.q_proj.weight":
                rng.standard_normal((32, 32)).astype(np.float32),
            "text_model.encoder.layers.0.mlp.fc1.weight":
                rng.standard_normal((64, 32)).astype(np.float32),
            "text_model.encoder.layers.0.layer_norm1.weight":
                np.ones(32, np.float32),
            "text_model.final_layer_norm.weight": np.ones(32, np.float32),
        }
        tree = convert_text_encoder(state)
        assert tree["token_embedding"]["embedding"].shape == (100, 32)
        assert tree["position_embedding"].shape == (77, 32)
        assert tree["layers_0"]["self_attn"]["q_proj"]["kernel"].shape == (32, 32)
        assert tree["layers_0"]["fc1"]["kernel"].shape == (32, 64)
        assert tree["layers_0"]["layer_norm1"]["scale"].shape == (32,)
        assert tree["final_layer_norm"]["scale"].shape == (32,)


class TestLDMVariantMerging:
    """merge_crossattn / merge_ff (reference LDM ToMeBlock, patch.py:104-114)."""

    def _run(self, merge_crossattn, merge_ff, x, ctx):
        import jax

        from tests.helpers import make_tiny_bundle
        from vidtome_tpu.models.tome import ToMeCall, ToMeConfig

        bundle = make_tiny_bundle()
        tome = ToMeConfig(frames=4, local_merge_ratio=0.9,
                          merge_crossattn=merge_crossattn, merge_ff=merge_ff)
        unet = bundle.make_unet(tome=tome)
        return unet.apply(
            {"params": bundle.unet_params}, x, jnp.asarray(3), ctx,
            tome_call=ToMeCall(key=jax.random.key(5), bank_mode="off"),
            num_lanes=2)

    @pytest.mark.slow
    def test_identical_frames_match_baseline_exactly(self):
        """With all frames identical, every merged-away token's dst holds
        its own value, so running attn2/ff on the merged sequence must give
        the same result as the unmerged path (per-token ops commute with
        the unmerge gather)."""
        import jax

        frame = jax.random.normal(jax.random.key(0), (2, 1, 16, 16, 4),
                                  jnp.float32)
        x = jnp.broadcast_to(frame, (2, 4, 16, 16, 4)).reshape(8, 16, 16, 4)
        ctx = jnp.repeat(jax.random.normal(jax.random.key(1), (2, 8, 32),
                                           jnp.float32), 4, axis=0)
        base = self._run(False, False, x, ctx)
        ldm = self._run(True, True, x, ctx)
        np.testing.assert_allclose(np.asarray(ldm), np.asarray(base),
                                   atol=1e-5, rtol=1e-5)

    @pytest.mark.slow
    def test_distinct_frames_differ_but_finite(self):
        import jax

        x = jax.random.normal(jax.random.key(2), (8, 16, 16, 4), jnp.float32)
        ctx = jnp.repeat(jax.random.normal(jax.random.key(3), (2, 8, 32),
                                           jnp.float32), 4, axis=0)
        base = self._run(False, False, x, ctx)
        ldm = self._run(True, True, x, ctx)
        assert np.isfinite(np.asarray(ldm)).all()
        assert np.abs(np.asarray(ldm) - np.asarray(base)).max() > 1e-6
