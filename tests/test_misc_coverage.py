"""Coverage for remaining non-graph paths: conv-LoRA, eval CLI, chunk
schedule distribution, tokenizer truncation."""

import json

import numpy as np
import pytest


def test_conv_lora_merge():
    import jax.numpy as jnp

    from vidtome_tpu.models.lora import merge_lora_state

    rng = np.random.default_rng(0)
    params = {"down_0_resnets_0": {"conv1": {
        "kernel": jnp.zeros((3, 3, 8, 16), jnp.float32)}}}
    up = rng.standard_normal((16, 4, 1, 1)).astype(np.float32)
    down = rng.standard_normal((4, 8, 3, 3)).astype(np.float32)
    state = {
        "lora_unet_down_blocks_0_resnets_0_conv1.lora_up.weight": up,
        "lora_unet_down_blocks_0_resnets_0_conv1.lora_down.weight": down,
        "lora_unet_down_blocks_0_resnets_0_conv1.alpha": np.float32(4.0),
    }
    merged = merge_lora_state(params, state, scale=1.0)
    got = np.asarray(merged["down_0_resnets_0"]["conv1"]["kernel"])
    expected = (up.reshape(16, 4) @ down.reshape(4, -1)).reshape(
        16, 8, 3, 3).transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_eval_cli_main(tmp_path, capsys):
    from tests.helpers import make_tiny_video
    from vidtome_tpu.eval import main

    a = make_tiny_video(str(tmp_path / "a"), 3, 64)
    main(["--a", a, "--b", a, "--height", "64", "--width", "64"])
    out = capsys.readouterr().out
    payload = json.loads(out[out.index("{"):])
    assert payload["frames"] == 3
    assert payload["ssim_mean"] > 0.999


def test_chunk_offset_distribution():
    """Rotation offsets must cover [0, chunk_size) so chunk boundaries
    decorrelate across timesteps (the purpose of the reference's ragged
    first chunk)."""
    from vidtome_tpu.core.chunk import chunk_schedule

    rng = np.random.default_rng(3)
    phases = set()
    for _ in range(200):
        sch = chunk_schedule(16, 4, rng, chunk_ord="seq")
        phases.add(int(sch.frame_order[0]) % 4)
    # every boundary phase within a chunk period must occur
    assert phases == {0, 1, 2, 3}


def test_tokenizer_truncation():
    from vidtome_tpu.models.tokenizer import HashTokenizer

    tok = HashTokenizer(vocab_size=100, max_length=8)
    ids = tok(" ".join(["word"] * 50))
    assert ids.shape == (1, 8)
    assert ids[0, 0] == tok.bos and ids[0, -1] == tok.eos


@pytest.mark.slow
def test_merged_local_len_matches_actual():
    """ToMeConfig.merged_local_len's closed form must match the real merged
    shape for several (frames, ratio, stride) combos."""
    import jax
    import jax.numpy as jnp

    from vidtome_tpu.core.merge import compute_local_merge
    from vidtome_tpu.models.tome import ToMeConfig

    for F, ratio, stride, tnum in [(4, 0.9, 4, 64), (8, 0.9, 4, 32),
                                   (4, 1.0, 4, 16), (2, 0.5, 4, 64),
                                   (16, 0.75, 4, 8)]:
        cfg = ToMeConfig(frames=F, local_merge_ratio=ratio,
                         target_stride=stride)
        x = jax.random.normal(jax.random.key(0), (1, F * tnum, 8))
        merged, _ = compute_local_merge(x, F, ratio, jax.random.key(1),
                                        target_stride=stride)
        assert merged.shape[1] == cfg.merged_local_len(tnum), (
            F, ratio, stride, tnum)


class TestPerStagePrecision:
    """Reference invert.py:26: a stage may request a different
    float_precision than the pipeline; weights are re-cast per stage."""

    def test_cast_both_directions(self):
        import jax.numpy as jnp

        from tests.helpers import make_tiny_bundle
        from vidtome_tpu.pipeline.common import resolve_precision

        bundle = make_tiny_bundle(dtype=jnp.bfloat16)
        leaf = lambda b: b.unet_params["conv_in"]["kernel"].dtype

        prec = resolve_precision({"float_precision": "bf16"},
                                 {"float_precision": "fp32"}, bundle)
        assert prec == "fp32" and bundle.dtype == jnp.float32
        assert leaf(bundle) == jnp.float32
        assert bundle.vae_params["encoder"] is not None

        prec = resolve_precision({"float_precision": "bf16"}, {}, bundle)
        assert prec == "bf16" and bundle.dtype == jnp.bfloat16
        assert leaf(bundle) == jnp.bfloat16

    def test_stage_modules_follow_cast(self):
        import jax.numpy as jnp

        from tests.helpers import make_tiny_bundle
        from vidtome_tpu.pipeline.common import resolve_precision

        bundle = make_tiny_bundle(dtype=jnp.bfloat16)
        resolve_precision({}, {"float_precision": "fp32"}, bundle)
        unet = bundle.make_unet()
        assert unet.dtype == jnp.float32
