"""Measure the production sample-block executable directly: where does the
per-step time go vs the isolated chunk-forward microbenchmark?

Times (a) one 10-step block dispatch, (b) VAE decode of the full clip,
(c) one isolated merge-mode chunk forward for reference.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/time_block.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

from vidtome_tpu.config import Config
from vidtome_tpu.core import chunk as chunking
from vidtome_tpu.models.registry import init_model
from vidtome_tpu.pipeline.generator import Generator


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ldm", action="store_true",
                    help="merge_crossattn + merge_ff (LDM-variant fast mode)")
    ap.add_argument("--int8", action="store_true", help="W8A8 serving graph")
    ap.add_argument("--cache", type=int, default=0,
                    help="deep-feature cache interval")
    ap.add_argument("--cfg", type=int, default=0,
                    help="CFG uncond-lane cache interval")
    args = ap.parse_args()
    frames, steps, size = 32, 50, 512
    latent = size // 8
    bundle = init_model(sd_version="1.5", weight_dtype="bf16")
    cfg = Config({
        "sd_version": "1.5", "height": size, "width": size,
        "seed": 123, "work_dir": "/tmp/bench", "float_precision": "bf16",
        "generation": {
            "control": "none", "guidance_scale": 7.5,
            "n_timesteps": steps, "negative_prompt": "ugly, blurry",
            "prompt": {"edit": "benchmark prompt"},
            "latents_path": "/tmp/bench", "output_path": "/tmp/bench",
            "chunk_size": 4, "chunk_ord": "mix-4",
            "local_merge_ratio": 0.9, "merge_global": True,
            "global_merge_ratio": 0.8, "global_rand": 0.5,
            "align_batch": False, "save_frame": False,
            "merge_crossattn": args.ldm, "merge_ff": args.ldm,
            "quant": "int8" if args.int8 else "none",
            "cache_interval": args.cache, "cfg_interval": args.cfg,
        },
    })
    gen = Generator(bundle, cfg)
    gen.configure_frames(frames)
    gen.depth = None
    gen.control_images = None
    latents = jax.random.normal(
        jax.random.key(0), (gen.n_padded, latent, latent, 4), jnp.bfloat16)
    context = gen.text.embed_cfg("a benchmark prompt", "ugly, blurry")

    t0 = time.time()
    gen.warmup(latents, context)
    print(f"warmup {time.time()-t0:.1f}s")

    # one block of block_size steps, exactly as _ddim_sample does
    import numpy as np

    rng = np.random.default_rng(0)
    fidx_table = jnp.asarray(chunking.build_fidx_table(
        gen.n_padded, 4, rng, steps, chunk_ord="mix", perm_div=4.0,
        merge_global=True), jnp.int32)
    zero = jnp.zeros((), jnp.bfloat16)
    gs = jnp.asarray(7.5, jnp.float32)
    block = gen._block_size()

    x = jnp.copy(latents)
    deep = gen._cache_buffers(x)
    zero_i = jnp.asarray(0, jnp.int32)
    modes = gen._mode_masks()
    # warm the exact executable
    x, deep = gen._sample_block(gen._params, x, deep, zero_i, modes,
                                fidx_table, context, zero, zero, zero, gs,
                                n_steps=block)
    _ = float(jnp.sum(x))

    t0 = time.time()
    n_blocks = 0
    for s in range(0, 30, block):
        x, deep = gen._sample_block(gen._params, x, deep,
                                    jnp.asarray(s, jnp.int32), modes,
                                    fidx_table, context, zero, zero, zero,
                                    gs, n_steps=block)
        n_blocks += 1
    _ = float(jnp.sum(x))
    per_block = (time.time() - t0) / n_blocks
    print(f"block({block} steps): {per_block*1e3:.1f}ms "
          f"=> {per_block/block*1e3:.1f}ms/step "
          f"=> {frames/(per_block/block)/steps:.3f} frames/s equiv")

    # decode cost
    dec = gen.vae.decode(latents[:4])
    _ = float(jnp.sum(dec))
    t0 = time.time()
    dec = gen.vae.decode(latents[:frames])
    _ = float(jnp.sum(dec))
    print(f"vae decode {frames} frames: {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
