"""Benchmark: edit throughput of the generation stage on one TPU chip.

Measures the BASELINE.md headline: frames/sec editing a 32-frame 512p clip
at 50 DDIM steps (CFG batch 2, chunk 4, local merge 0.9 + global merge 0.8
— the reference's default working config) through the REAL Generator code
path (chunk scheduling, token banks, DDIM updates) plus VAE decode.

Weights are random (zero-egress environment — identical compute graph and
cost to real SD1.5 weights).  Timing forces device completion via scalar
fetches: on tunneled backends ``block_until_ready`` alone does not wait.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
denominator is an analytic A100-PyTorch-fp16 estimate for the same
workload: SD1.5 UNet ~0.68 TFLOP/frame-step x 2 CFG lanes x 50 steps at
~45% MFU with ~25% attention savings from merging => ~1.8 frames/s.  The
north-star target is vs_baseline >= 3.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N/1.8}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

A100_BASELINE_FPS = 1.8


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=32)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--quick", action="store_true",
                        help="5 steps / 8 frames smoke run")
    parser.add_argument("--sdxl", action="store_true",
                        help="SDXL-1024p merged-UNet stress benchmark "
                             "(BASELINE stress config) instead of the edit "
                             "pipeline")
    parser.add_argument("--no-share-match", action="store_true",
                        help="re-match per block instead of sharing the "
                             "bipartite matching across sibling blocks per "
                             "level (the production default shares)")
    args = parser.parse_args()
    if args.quick:
        args.frames, args.steps = 8, 5
    if args.sdxl:
        return bench_sdxl(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidtome_tpu.runtime import setup_compilation_cache

    setup_compilation_cache()

    from vidtome_tpu.config import Config
    from vidtome_tpu.models.registry import init_model
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.core import chunk as chunking

    t0 = time.time()
    bundle = init_model(sd_version="1.5", weight_dtype="bf16")
    print(f"[bench] model ready in {time.time() - t0:.1f}s", file=sys.stderr)

    latent = args.size // 8
    cfg = Config({
        "sd_version": "1.5", "height": args.size, "width": args.size,
        "seed": 123, "work_dir": "/tmp/bench", "float_precision": "bf16",
        "generation": {
            "control": "none", "guidance_scale": 7.5,
            "n_timesteps": args.steps, "negative_prompt": "ugly, blurry",
            "prompt": {"edit": "benchmark prompt"},
            "latents_path": "/tmp/bench", "output_path": "/tmp/bench",
            "chunk_size": 4, "chunk_ord": "mix-4",
            "local_merge_ratio": 0.9, "merge_global": True,
            "global_merge_ratio": 0.8, "global_rand": 0.5,
            "align_batch": False, "save_frame": False,
            "share_match": not args.no_share_match,
        },
    })
    gen = Generator(bundle, cfg)

    # Inject synthetic prepared data (bench has no inversion cache).
    gen.n_frames = args.frames
    gen.n_padded, gen.pad_src = chunking.pad_to_chunks(args.frames, 4)
    gen.depth = None
    gen.control_images = None
    latents = jax.random.normal(
        jax.random.key(0), (gen.n_padded, latent, latent, 4), jnp.bfloat16)
    context = gen.text.embed_cfg("a benchmark prompt", "ugly, blurry")

    # Warmup: compile both bank variants + ddim + decode.
    t0 = time.time()
    gen.warmup(latents, context)
    _ = float(jnp.sum(gen.vae.decode(latents[:4])))
    print(f"[bench] warmup/compile in {time.time() - t0:.1f}s",
          file=sys.stderr)

    # Secondary: inversion-stage throughput (frames are independent; the
    # other half of a full edit). Uses the same UNet params, no merging.
    from vidtome_tpu.pipeline.inverter import Inverter

    inv_cfg = Config(cfg.to_dict())
    inv_cfg["inversion"] = {
        "save_path": "/tmp/bench/latents", "prompt": "benchmark",
        "steps": args.steps, "save_steps": args.steps,
        "save_intermediate": False, "batch_size": 8, "force": True,
        "recon": False, "control": "none", "control_scale": 1.0,
        "n_frames": None,
    }
    inv = Inverter(bundle, inv_cfg)
    conds = inv.text(["benchmark prompt"] * args.frames)
    lat0 = jax.random.normal(jax.random.key(5),
                             (args.frames, latent, latent, 4), jnp.bfloat16)
    # warm with the EXACT executable (full frame count): the scanned step
    # compiles per batch count, so a smaller warmup would leave the compile
    # inside the timing
    warm = inv._full_step(inv._params, jnp.copy(lat0), inv._tables,
                          jnp.asarray(0, jnp.int32), True, conds, None, None)
    _ = float(jnp.sum(warm))
    t0 = time.time()
    out = inv._run(lat0, conds, None, None, inversion=True)
    _ = float(jnp.sum(out))
    inv_elapsed = time.time() - t0
    print(f"[bench] inversion: {args.frames} frames x {args.steps} steps in "
          f"{inv_elapsed:.2f}s ({args.frames / inv_elapsed:.2f} frames/s)",
          file=sys.stderr)

    # Timed run: full generation + decode, forced completion.
    t0 = time.time()
    clean = gen.ddim_sample(latents, context)
    frames_out = gen.vae.decode(clean[: args.frames])
    checksum = float(jnp.sum(frames_out))  # forces full execution
    elapsed = time.time() - t0

    fps = args.frames / elapsed
    result = {
        "metric": "edit_frames_per_sec_512p_50step_1xv5e",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 4),
    }
    print(f"[bench] {args.frames} frames x {args.steps} steps in "
          f"{elapsed:.2f}s (checksum {checksum:.2f})", file=sys.stderr)
    print(json.dumps(result))


def bench_sdxl(args):
    """SDXL merged-UNet chunk throughput at 1024p (stress config: 128x128
    latents, 32+ frame clip, high merge ratio)."""
    import jax
    import jax.numpy as jnp

    from vidtome_tpu.runtime import setup_compilation_cache

    setup_compilation_cache()

    from vidtome_tpu.models.registry import _jit_init
    from vidtome_tpu.models.tome import ToMeCall, ToMeConfig
    from vidtome_tpu.models.unet import SDXL_UNET, UNet2DConditionModel

    tome = ToMeConfig(frames=4, local_merge_ratio=0.9, merge_global=False,
                      max_downsample=2)
    unet = UNet2DConditionModel(config=SDXL_UNET, tome=tome,
                                dtype=jnp.bfloat16)
    lat = 128  # 1024p latents
    t0 = time.time()
    x0 = jnp.zeros((1, 8, 8, 4), jnp.bfloat16)
    ctx0 = jnp.zeros((1, 8, 2048), jnp.bfloat16)
    params = _jit_init(unet, x0, jnp.asarray(0), ctx0)
    print(f"[bench] SDXL params ready in {time.time() - t0:.1f}s",
          file=sys.stderr)

    B = 8  # 2 CFG lanes x 4 frames
    x = jax.random.normal(jax.random.key(0), (B, lat, lat, 4), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.key(1), (B, 77, 2048), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(2), (B, 1280), jnp.bfloat16)
    tids = jnp.tile(jnp.asarray([[1024., 1024., 0., 0., 1024., 1024.]]),
                    (B, 1))

    @jax.jit
    def fwd(params, x, ctx, key):
        return unet.apply(
            {"params": params}, x, jnp.asarray(500), ctx,
            tome_call=ToMeCall(key=key, bank_mode="off"), num_lanes=2,
            add_text_embeds=pooled, add_time_ids=tids)

    t0 = time.time()
    out = fwd(params, x, ctx, jax.random.key(3))
    _ = float(jnp.sum(out))
    print(f"[bench] SDXL compile in {time.time() - t0:.1f}s",
          file=sys.stderr)
    n = 10
    t0 = time.time()
    for i in range(n):
        out = fwd(params, x, ctx, jax.random.fold_in(jax.random.key(4), i))
    _ = float(jnp.sum(out))
    ms = (time.time() - t0) / n * 1e3
    fps = 4.0 / ((ms / 1e3) * args.steps)  # 4 frames per chunk call
    result = {
        "metric": "sdxl_1024p_merged_unet_frames_per_sec_50step",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": None,
    }
    print(f"[bench] SDXL chunk fwd {ms:.1f} ms", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
