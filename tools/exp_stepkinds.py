"""Per-step-kind wall costs of the serve-profile sample block.

The xplane trace buries the serve loop's step work inside lax.cond
wrappers (the 'conditional' event double-counts its branch body), so
this probe measures each step KIND directly: the mode table fed to the
production `_sample_block` is just an input array — hand-build uniform
tables (all-full / all-shallow / all-cfgskip / all-skip / the real
schedule) and time one warm block of each.  The decomposition tells us
where the serve loop's wall actually goes and what the next lever is
worth (VERDICT r5 item 1).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_stepkinds.py \
        [--profile maxe2x] [--frames 32] [--steps 50]

Writes perf/stepkinds_r5.json.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--profile", default="maxe2x")
    ap.add_argument("--out", default=None,
                    help="artifact path (default perf/stepkinds_r5.json)")
    args = ap.parse_args()

    bench = _load_bench()
    from vidtome_tpu.config import Config
    from vidtome_tpu.models.registry import init_model
    from vidtome_tpu.pipeline.generator import Generator

    bundle = init_model(sd_version="1.5", weight_dtype="bf16")
    latent = args.size // 8
    gene = {
        "control": "none", "guidance_scale": 7.5,
        "n_timesteps": args.steps, "negative_prompt": "ugly, blurry",
        "prompt": {"edit": "benchmark prompt"},
        "latents_path": "/tmp/bench", "output_path": "/tmp/bench",
        "chunk_size": 4, "chunk_ord": "mix-4",
        "local_merge_ratio": 0.9, "merge_global": True,
        "global_merge_ratio": 0.8, "global_rand": 0.5,
        "align_batch": False, "save_frame": False,
    }
    gene.update(bench.SERVE_PROFILES[args.profile])
    cfg = Config({
        "sd_version": "1.5", "height": args.size, "width": args.size,
        "seed": 123, "work_dir": "/tmp/bench", "float_precision": "bf16",
        "generation": gene,
    })
    gen = Generator(bundle, cfg)
    gen.configure_frames(args.frames)
    gen.depth = None
    gen.control_images = None
    x = jax.random.normal(jax.random.key(0),
                          (gen.n_padded, latent, latent, 4), jnp.bfloat16)
    context = gen.text.embed_cfg("a benchmark prompt", "ugly, blurry")
    t0 = time.time()
    gen.warmup(x, context)
    print(f"[stepkinds] warmup {time.time() - t0:.1f}s", file=sys.stderr)

    steps = gen.scheduler.num_steps
    block = gen._block_size()
    zero = jnp.zeros((), bundle.dtype)
    gs = jnp.asarray(gen.guidance_scale, jnp.float32)
    n_chunks = x.shape[0] // gen.chunk_size
    fidx = jnp.arange(x.shape[0], dtype=jnp.int32).reshape(
        n_chunks, gen.chunk_size)
    fidx_table = jnp.broadcast_to(
        jnp.stack([fidx, fidx], axis=-1),
        (steps, n_chunks, gen.chunk_size, 2))

    def time_block(mode_tab, label, reps=3):
        """Wall of one warm block with the given [steps, 3] mode table."""
        tab = jnp.asarray(mode_tab, jnp.int32)
        walls = []
        for r in range(reps + 1):
            y = jnp.copy(x)
            caches = gen._cache_buffers(x)
            # prefill pass at block 0 (all-full) so caches hold real data,
            # then the timed block at start=block uses the custom table
            y, caches = gen._sample_block(
                gen._params, y, caches, jnp.asarray(0, jnp.int32),
                jnp.asarray(np.ones((steps, 3), np.int32)), fidx_table,
                context, zero, zero, zero, gs, n_steps=block)
            _ = float(jnp.sum(y))
            t0 = time.time()
            y, caches = gen._sample_block(
                gen._params, y, caches, jnp.asarray(block, jnp.int32),
                tab, fidx_table, context, zero, zero, zero, gs,
                n_steps=block)
            _ = float(jnp.sum(y))
            if r > 0:  # rep 0 compiles/warms
                walls.append(time.time() - t0)
        ms = float(np.median(walls)) / block * 1e3
        print(f"[stepkinds] {label:24s} {ms:7.1f} ms/step", file=sys.stderr)
        return ms

    results = {}
    ones = np.ones((steps, 3), np.int32)
    # all-full: deep refresh + cfg refresh + run
    results["full"] = time_block(ones, "full (refresh both)")
    # shallow + cfg run: deep cached, cfg both-lanes
    tab = ones.copy(); tab[:, 0] = 0
    results["shallow_cfgfull"] = time_block(tab, "shallow + cfg-full")
    # shallow + cfg skip: deep cached, uncond lane dropped
    tab = ones.copy(); tab[:, 0] = 0; tab[:, 1] = 0
    results["shallow_cfgskip"] = time_block(tab, "shallow + cfg-skip")
    # full deep refresh but cfg skip
    tab = ones.copy(); tab[:, 1] = 0
    results["full_cfgskip"] = time_block(tab, "full + cfg-skip")
    # eps skip: no UNet at all
    tab = ones.copy(); tab[:, 2] = 0
    results["eps_skip"] = time_block(tab, "eps-skip (no UNet)")
    # the real schedule, steady-state block
    real = np.asarray(gen._mode_masks())
    results["real_block1"] = time_block(real, "real schedule (block 1)")

    # arithmetic check: expected wall of the full 50-step schedule from
    # the kind costs vs the real mode table
    kinds_ms = {
        (1, 1, 1): results["full"], (1, 0, 1): results["full_cfgskip"],
        (0, 1, 1): results["shallow_cfgfull"],
        (0, 0, 1): results["shallow_cfgskip"],
    }
    total = 0.0
    for row in real:
        if row[2] == 0:
            total += results["eps_skip"]
        else:
            total += kinds_ms[(int(row[0]), int(row[1]), 1)]
    print(f"[stepkinds] arithmetic schedule total: {total / 1e3:.2f}s "
          f"for {steps} steps", file=sys.stderr)
    out = {"profile": args.profile, "frames": args.frames,
           "steps": args.steps, "backend": jax.default_backend(),
           "ms_per_step": {k: round(v, 1) for k, v in results.items()},
           "schedule_arithmetic_s": round(total / 1e3, 2),
           "scope": "sample-block wall per step kind, warm, 32f 512p"}
    path = args.out or os.path.join(ROOT, "perf", "stepkinds_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": path}))


if __name__ == "__main__":
    main()
