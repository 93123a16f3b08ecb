"""IO, artifact-cache, preprocessor, tokenizer, and LoRA tests."""

import os

import numpy as np
import pytest


class TestVideoIO:
    def test_frame_dir_roundtrip(self, tmp_path):
        from tests.helpers import make_tiny_video
        from vidtome_tpu.io.video import load_video, save_frames

        d = make_tiny_video(str(tmp_path / "v"), n_frames=4, size=64)
        frames = load_video(d, 64, 64)
        assert frames.shape == (4, 64, 64, 3)
        assert frames.dtype == np.float32
        save_frames(frames, str(tmp_path / "out"), frame_ids=[3, 7, 9, 11])
        assert os.path.exists(tmp_path / "out" / "0011.png")

    def test_resize_crop_to_64_multiple(self, tmp_path):
        from PIL import Image

        from vidtome_tpu.io.video import load_video

        d = tmp_path / "odd"
        d.mkdir()
        Image.new("RGB", (300, 200)).save(d / "0000.png")
        frames = load_video(str(d), 128, 128)
        assert frames.shape[1] % 64 == 0 and frames.shape[2] % 64 == 0

    def test_mp4_roundtrip(self, tmp_path):
        from vidtome_tpu.io.video import load_video, save_video

        frames = np.tile(
            np.linspace(0, 1, 64, dtype=np.float32)[None, :, None, None],
            (5, 1, 64, 3)).transpose(0, 2, 1, 3)
        save_video(frames, str(tmp_path))
        back = load_video(str(tmp_path / "output.mp4"), 64, 64)
        assert back.shape == (5, 64, 64, 3)
        assert np.abs(back - frames).mean() < 0.05  # lossy codec tolerance


class TestArtifacts:
    def test_latent_cache_roundtrip(self, tmp_path):
        from vidtome_tpu.io import artifacts

        d = artifacts.get_latents_dir(str(tmp_path), "runwayml/sd-v1-5")
        assert d.endswith("sd-v1-5")
        lat = np.random.default_rng(0).standard_normal((4, 8, 8, 4))
        artifacts.save_latent(d, 981, lat)
        assert artifacts.check_latents_exist(d, [981])
        assert not artifacts.check_latents_exist(d, [981, 961])
        back = artifacts.load_latent(d, 981, frame_ids=[1, 3])
        np.testing.assert_array_equal(back, lat[[1, 3]])

    def test_control_cache(self, tmp_path):
        from vidtome_tpu.io import artifacts

        frames = np.random.default_rng(1).random((3, 32, 32, 3)).astype(
            np.float32)
        calls = []

        def compute(fr):
            calls.append(1)
            return fr * 0.5

        out1 = artifacts.load_or_compute_control(
            str(tmp_path), "canny", frames, [0, 1, 2], compute)
        out2 = artifacts.load_or_compute_control(
            str(tmp_path), "canny", frames, [0, 1, 2], compute)
        assert len(calls) == 1  # second load hits the png cache
        assert np.abs(out1 - out2).max() < 0.01


class TestPreprocessors:
    @pytest.fixture
    def frames(self):
        rng = np.random.default_rng(2)
        return rng.random((2, 64, 64, 3)).astype(np.float32)

    @pytest.mark.parametrize("kind", ["canny", "tile", "ip2p", "softedge",
                                      "lineart_anime"])
    def test_shapes(self, frames, kind):
        from vidtome_tpu.control.preprocess import control_preprocess

        out = control_preprocess(frames, kind)
        assert out.shape == frames.shape
        assert out.dtype == np.float32
        assert np.isfinite(out).all()

    def test_unknown_type_raises(self, frames):
        from vidtome_tpu.control.preprocess import control_preprocess

        with pytest.raises(KeyError):
            control_preprocess(frames, "nope")

    def test_depth_proxy(self, frames, tmp_path):
        from vidtome_tpu.control.depth import prepare_depth_latents

        d = prepare_depth_latents(frames, [0, 1], str(tmp_path))
        assert d.shape == (2, 8, 8, 1)
        assert d.min() >= -1.0 and d.max() <= 1.0
        # cached second call identical
        d2 = prepare_depth_latents(frames, [0, 1], str(tmp_path))
        np.testing.assert_array_equal(d, d2)


class TestTokenizer:
    def test_clip_bpe_from_files(self, tmp_path):
        import json

        from vidtome_tpu.models.tokenizer import CLIPTokenizer

        # toy vocab exercising the BPE merge machinery
        words = ["<|startoftext|>", "<|endoftext|>", "a</w>", "b</w>", "c</w>",
                 "a", "b", "c", "ab", "ab</w>", "abc</w>"]
        vocab = {w: i for i, w in enumerate(words)}
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        (tmp_path / "merges.txt").write_text(
            "#version: 0.2\na b\nab c</w>\nab b</w>\n")
        tok = CLIPTokenizer.from_dir(str(tmp_path), max_length=8)
        ids = tok(["abc"])
        assert ids.shape == (1, 8)
        assert ids[0, 0] == vocab["<|startoftext|>"]
        assert ids[0, 1] == vocab["abc</w>"]  # a+b -> ab, ab+c</w> -> abc</w>
        assert ids[0, 2] == vocab["<|endoftext|>"]

    def test_hash_tokenizer_deterministic(self):
        from vidtome_tpu.models.tokenizer import HashTokenizer

        tok = HashTokenizer(vocab_size=100, max_length=8)
        a, b = tok("hello world"), tok("hello world")
        np.testing.assert_array_equal(a, b)
        assert (a < 100).all()

    def test_hash_tokenizer_cross_process_stable(self):
        """Token ids must not depend on Python's per-process hash salt —
        inverting in one process and generating in another must condition
        on the same embeddings (crc32, not hash())."""
        import zlib

        from vidtome_tpu.models.tokenizer import HashTokenizer

        tok = HashTokenizer(vocab_size=100, max_length=8)
        ids = tok("hello")
        assert ids[0, 1] == zlib.crc32(b"hello") % 98


class TestLoRA:
    def test_kohya_merge(self):
        import jax.numpy as jnp

        from vidtome_tpu.models.lora import merge_lora_state

        rng = np.random.default_rng(3)
        params = {"down_0_attentions_0": {"transformer_blocks_0": {"attn1": {
            "to_q": {"kernel": jnp.asarray(
                rng.standard_normal((32, 32)).astype(np.float32))}}}}}
        up = rng.standard_normal((32, 4)).astype(np.float32)
        down = rng.standard_normal((4, 32)).astype(np.float32)
        state = {
            "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
            "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
            "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.alpha": np.float32(4.0),
        }
        orig = np.asarray(params["down_0_attentions_0"][
            "transformer_blocks_0"]["attn1"]["to_q"]["kernel"])
        merged = merge_lora_state(params, state, scale=0.5)
        got = np.asarray(merged["down_0_attentions_0"][
            "transformer_blocks_0"]["attn1"]["to_q"]["kernel"])
        expected = orig + 0.5 * (4.0 / 4) * (up @ down).T
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_kohya_time_emb_proj_dotting(self):
        """'time_emb_proj' must survive intact — the shorter 'proj'
        substitution used to split it into 'time_emb.proj' so those LoRA
        tensors were silently skipped."""
        from vidtome_tpu.models.lora import _kohya_to_dotted

        got = _kohya_to_dotted("lora_unet_down_blocks_0_resnets_0_time_emb_proj")
        assert got == "down_blocks.0.resnets.0.time_emb_proj"
        got = _kohya_to_dotted(
            "lora_unet_up_blocks_1_attentions_2_transformer_blocks_0_ff_net_0_proj")
        assert got == "up_blocks.1.attentions.2.transformer_blocks.0.ff.net.0.proj"

    def test_peft_format(self):
        import jax.numpy as jnp

        from vidtome_tpu.models.lora import merge_lora_state

        rng = np.random.default_rng(4)
        params = {"mid_attentions_0": {"transformer_blocks_0": {"attn2": {
            "to_k": {"kernel": jnp.zeros((16, 16), jnp.float32)}}}}}
        up = rng.standard_normal((16, 2)).astype(np.float32)
        down = rng.standard_normal((2, 16)).astype(np.float32)
        state = {
            "unet.mid_block.attentions.0.transformer_blocks.0.attn2.to_k.lora_B.weight": up,
            "unet.mid_block.attentions.0.transformer_blocks.0.attn2.to_k.lora_A.weight": down,
        }
        merged = merge_lora_state(params, state, scale=1.0)
        got = np.asarray(merged["mid_attentions_0"][
            "transformer_blocks_0"]["attn2"]["to_k"]["kernel"])
        np.testing.assert_allclose(got, (up @ down).T, rtol=1e-5, atol=1e-5)


class TestControlNetModel:
    @pytest.mark.slow
    def test_residual_shapes_match_unet_skips(self):
        import jax
        import jax.numpy as jnp

        from vidtome_tpu.models.controlnet import ControlNetModel
        from vidtome_tpu.models.unet import TINY_UNET, UNet2DConditionModel

        cn = ControlNetModel(config=TINY_UNET, dtype=jnp.float32,
                             use_pallas=False)
        x = jnp.zeros((2, 8, 8, 4))
        ctx = jnp.zeros((2, 8, 32))
        cond = jnp.zeros((2, 64, 64, 3))
        params = cn.init(jax.random.key(0), x, jnp.asarray(0), ctx, cond)
        down_r, mid_r = cn.apply(params, x, jnp.asarray(0), ctx, cond,
                                 conditioning_scale=0.5)
        # feed residuals into the UNet — shapes must line up exactly
        unet = UNet2DConditionModel(config=TINY_UNET, dtype=jnp.float32,
                                    use_pallas=False)
        up = unet.init(jax.random.key(1), x, jnp.asarray(0), ctx)
        out = unet.apply(up, x, jnp.asarray(0), ctx,
                         down_residuals=down_r, mid_residual=mid_r)
        assert out.shape == (2, 8, 8, 4)
        # zero-init output convs -> zero residuals at init
        assert all(float(abs(r).max()) == 0.0 for r in down_r)
        assert float(abs(mid_r).max()) == 0.0


class TestTextEncoderLoRA:
    """The reference's pipe.load_lora_weights (generate.py:93-94) applies
    text-encoder LoRA components too — ours must as well."""

    def test_te_kohya_merge(self):
        import jax.numpy as jnp

        from vidtome_tpu.models.lora import merge_lora_text_state

        rng = np.random.default_rng(7)
        params = {"layers_0": {"self_attn": {"q_proj": {
            "kernel": jnp.zeros((24, 24), jnp.float32)}}}}
        up = rng.standard_normal((24, 4)).astype(np.float32)
        down = rng.standard_normal((4, 24)).astype(np.float32)
        state = {
            "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight": up,
            "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight": down,
            "lora_te_text_model_encoder_layers_0_self_attn_q_proj.alpha": np.float32(8.0),
        }
        merged = merge_lora_text_state(params, state, scale=0.5)
        got = np.asarray(merged["layers_0"]["self_attn"]["q_proj"]["kernel"])
        np.testing.assert_allclose(got, 0.5 * (8.0 / 4) * (up @ down).T,
                                   rtol=1e-5, atol=1e-5)

    def test_te_peft_format_mlp(self):
        import jax.numpy as jnp

        from vidtome_tpu.models.lora import merge_lora_text_state

        rng = np.random.default_rng(8)
        params = {"layers_1": {"fc1": {
            "kernel": jnp.zeros((16, 32), jnp.float32)}}}
        up = rng.standard_normal((32, 2)).astype(np.float32)
        down = rng.standard_normal((2, 16)).astype(np.float32)
        state = {
            "text_encoder.text_model.encoder.layers.1.mlp.fc1.lora_B.weight": up,
            "text_encoder.text_model.encoder.layers.1.mlp.fc1.lora_A.weight": down,
        }
        merged = merge_lora_text_state(params, state, scale=1.0)
        got = np.asarray(merged["layers_1"]["fc1"]["kernel"])
        np.testing.assert_allclose(got, (up @ down).T, rtol=1e-5, atol=1e-5)

    def test_bundle_apply_unet_and_te(self, tmp_path):
        """A LoRA with both UNet and TE tensors changes both trees and the
        text-encoder output."""
        import jax.numpy as jnp

        from tests.helpers import make_tiny_bundle
        from vidtome_tpu.models.lora import apply_lora_bundle
        from vidtome_tpu.pipeline.common import TextEncoder

        bundle = make_tiny_bundle()
        rng = np.random.default_rng(9)

        qk = bundle.text_params["layers_0"]["self_attn"]["q_proj"]["kernel"]
        c = qk.shape[0]
        te_up = rng.standard_normal((qk.shape[1], 2)).astype(np.float32)
        te_down = rng.standard_normal((2, c)).astype(np.float32)

        uk = bundle.unet_params["down_0_attentions_0"]["transformer_blocks_0"][
            "attn1"]["to_q"]["kernel"]
        u_up = rng.standard_normal((uk.shape[1], 2)).astype(np.float32)
        u_down = rng.standard_normal((2, uk.shape[0])).astype(np.float32)

        state = {
            "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight": te_up,
            "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight": te_down,
            "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_up.weight": u_up,
            "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_down.weight": u_down,
        }
        import safetensors.numpy

        path = str(tmp_path / "lora.safetensors")
        safetensors.numpy.save_file(state, path)

        before = np.asarray(TextEncoder(bundle)("a prompt"))
        old_q = np.asarray(qk)
        apply_lora_bundle(bundle, {"path": path, "weight": 1.0})

        got_q = np.asarray(
            bundle.text_params["layers_0"]["self_attn"]["q_proj"]["kernel"])
        np.testing.assert_allclose(got_q, old_q + (te_up @ te_down).T,
                                   rtol=1e-4, atol=1e-4)
        got_u = np.asarray(
            bundle.unet_params["down_0_attentions_0"]["transformer_blocks_0"][
                "attn1"]["to_q"]["kernel"])
        np.testing.assert_allclose(
            got_u, np.asarray(uk) + (u_up @ u_down).T, rtol=1e-4, atol=1e-4)

        after = np.asarray(TextEncoder(bundle)("a prompt"))
        assert not np.allclose(before, after)

    def test_te2_kohya_namespace(self):
        """SDXL second-encoder tensors (lora_te2_*) land in the te2
        namespace and not in te/unet."""
        import jax.numpy as jnp

        from vidtome_tpu.models.lora import _collect_pairs, merge_lora_text_state

        rng = np.random.default_rng(11)
        up = rng.standard_normal((16, 2)).astype(np.float32)
        down = rng.standard_normal((2, 16)).astype(np.float32)
        state = {
            "lora_te2_text_model_encoder_layers_0_self_attn_k_proj.lora_up.weight": up,
            "lora_te2_text_model_encoder_layers_0_self_attn_k_proj.lora_down.weight": down,
        }
        pairs = _collect_pairs(state)
        assert not pairs["unet"] and not pairs["te"]
        assert "text_model.encoder.layers.0.self_attn.k_proj" in pairs["te2"]

        params = {"layers_0": {"self_attn": {"k_proj": {
            "kernel": jnp.zeros((16, 16), jnp.float32)}}}}
        merged = merge_lora_text_state(params, state, scale=1.0, encoder=2)
        got = np.asarray(merged["layers_0"]["self_attn"]["k_proj"]["kernel"])
        np.testing.assert_allclose(got, (up @ down).T, rtol=1e-5, atol=1e-5)
