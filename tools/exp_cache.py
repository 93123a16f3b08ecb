"""Probe: per-step wall time of the sample block vs cache_interval /
cfg_interval (serving-cache modes), at quick shapes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_cache.py \
           [--frames 8] [--steps 10] [--size 512] [--int8]
"""

from __future__ import annotations

import argparse
import sys
import time

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vidtome_tpu.config import Config
from vidtome_tpu.core import chunk as chunking
from vidtome_tpu.models.registry import init_model
from vidtome_tpu.pipeline.generator import Generator


def run_one(bundle, args, latents, context, **gene_overrides):
    gene = {
        "control": "none", "guidance_scale": 7.5,
        "n_timesteps": args.steps, "negative_prompt": "ugly, blurry",
        "prompt": {"edit": "probe"},
        "latents_path": "/tmp/bench", "output_path": "/tmp/bench",
        "chunk_size": 4, "chunk_ord": "mix-4",
        "local_merge_ratio": 0.9, "merge_global": True,
        "global_merge_ratio": 0.8, "global_rand": 0.5,
        "align_batch": False, "save_frame": False,
        "quant": "int8" if args.int8 else "none",
    }
    gene.update(gene_overrides)
    cfg = Config({
        "sd_version": "1.5", "height": args.size, "width": args.size,
        "seed": 123, "work_dir": "/tmp/bench", "float_precision": "bf16",
        "generation": gene,
    })
    gen = Generator(bundle, cfg)
    gen.configure_frames(args.frames)
    gen.depth = None
    gen.control_images = None
    t0 = time.time()
    gen.warmup(latents, context)
    compile_s = time.time() - t0
    # timed: two back-to-back full sample loops, report the second
    for it in range(2):
        t0 = time.time()
        clean = gen.ddim_sample(jnp.copy(latents), context)
        _ = float(jnp.sum(clean))
        wall = time.time() - t0
    return compile_s, wall / args.steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()

    bundle = init_model(sd_version="1.5", weight_dtype="bf16")
    latent = args.size // 8
    n_padded, _ = chunking.pad_to_chunks(args.frames, 4)
    latents = jax.random.normal(jax.random.key(0),
                                (n_padded, latent, latent, 4), jnp.bfloat16)
    g0 = Generator(bundle, Config({
        "sd_version": "1.5", "height": args.size, "width": args.size,
        "seed": 1, "work_dir": "/tmp/bench", "float_precision": "bf16",
        "generation": {"control": "none", "guidance_scale": 7.5,
                       "n_timesteps": args.steps, "prompt": {"e": "p"},
                       "latents_path": "/tmp/bench",
                       "output_path": "/tmp/bench"}}))
    context = g0.text.embed_cfg("probe", "ugly, blurry")

    for label, over in [
        ("off", {}),
        ("cache2", {"cache_interval": 2}),
        ("cache3", {"cache_interval": 3}),
        ("cfg2", {"cfg_interval": 2}),
        ("cache3+cfg2", {"cache_interval": 3, "cfg_interval": 2}),
        ("cache2+cfg2", {"cache_interval": 2, "cfg_interval": 2}),
        ("w3", {"cache_schedule": "full:6,uniform:3"}),
        ("w3+cfg2", {"cache_schedule": "full:6,uniform:3",
                     "cfg_interval": 2}),
        ("w42", {"cache_schedule": "full:6,uniform:4",
                 "cfg_schedule": "full:6,uniform:2"}),
        ("w63", {"cache_schedule": "full:6,uniform:6",
                 "cfg_schedule": "full:6,uniform:3"}),
        ("w82", {"cache_schedule": "full:6,uniform:8",
                 "cfg_schedule": "full:6,uniform:2"}),
        ("w42_m95", {"cache_schedule": "full:6,uniform:4",
                     "cfg_schedule": "full:6,uniform:2",
                     "local_merge_ratio": 0.95}),
    ]:
        c, ms = run_one(bundle, args, latents, context, **over)
        print(f"{label:14s} compile {c:6.1f}s   {ms:7.1f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
