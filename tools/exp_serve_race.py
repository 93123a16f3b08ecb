"""Race the gated serving profiles at the REAL headline scale.

exp_cache.py measures profile step costs at 8-frame scale, where chunk
count (2) and merged-attention lengths understate the 32-frame workload;
this probe times the full 32-frame x 50-step sample loop + decode for
each gated profile in ONE process (tunnel-wedge policy, docs/ROUND4.md)
so the headline profile choice is made on the actual workload.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_serve_race.py \
        [--frames 32] [--steps 50] [--profiles w42,w82,w82_m95,max]

Prints one JSON line per profile ({"profile": ..., "fps": ...}) and a
final ranking.  Also measures the exact bf16 pipeline and the inversion
int8 lever for the end-to-end arithmetic.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--profiles", default="w42,w82,w82_m95,max")
    ap.add_argument("--block", type=int, default=0,
                    help="steps_per_block override injected into every "
                         "raced profile (0 = Generator default of 10); "
                         "numerics-neutral — no gate needed")
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--skip-inv", action="store_true")
    ap.add_argument("--inv-profiles",
                    default="bf16,int8,cache_w3,int8_fused",
                    help="comma list: 'bf16' or names from "
                         "bench.INV_SERVE_PROFILES")
    ap.add_argument("--out", default=None,
                    help="also write every row + the ranking to this JSON "
                         "path (perf/serve_race_r*.json artifact)")
    args = ap.parse_args()

    import bench
    from vidtome_tpu.models.registry import init_model
    from vidtome_tpu.config import Config
    from vidtome_tpu.pipeline.generator import Generator

    margs = types.SimpleNamespace(frames=args.frames, steps=args.steps,
                                  size=args.size, ldm=False)
    bundle = init_model(sd_version="1.5", weight_dtype="bf16")
    latent = args.size // 8

    # context/latents once (any profile's Generator pads the same way)
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
        },
    })
    gen0 = Generator(bundle, cfg)
    gen0.configure_frames(args.frames)
    latents = jax.random.normal(
        jax.random.key(0), (gen0.n_padded, latent, latent, 4),
        jnp.bfloat16)
    context = gen0.text.embed_cfg("a benchmark prompt", "ugly, blurry")

    results = {}
    if not args.skip_exact:
        gen0.depth = None
        gen0.control_images = None
        t0 = time.time()
        gen0.warmup(latents, context)
        # decode warm at full frame count — the round-4 exact row was
        # compile-contaminated (perf/serve_race_r4.json note)
        _ = float(jnp.sum(gen0.vae.decode(latents[: args.frames])))
        print(f"[race] exact warmup {time.time() - t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        clean = gen0.ddim_sample(latents, context)
        _ = float(jnp.sum(clean))
        _ = float(jnp.sum(gen0.vae.decode(clean[: args.frames])))
        results["exact"] = args.frames / (time.time() - t0)
        print(json.dumps({"profile": "exact",
                          "fps": round(results["exact"], 4)}))

    for name in args.profiles.split(","):
        try:
            over = dict(bench.SERVE_PROFILES[name])
            if args.block:
                over["steps_per_block"] = args.block
            fps = bench._measure_mode_fps(
                bundle, margs, latents, context, f"serve_{name}", **over)
            results[name] = fps
            print(json.dumps({"profile": name, "fps": round(fps, 4),
                              "steps_per_block": args.block or 10}))
        except Exception as e:
            print(f"[race] {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    if not args.skip_inv:
        from vidtome_tpu.pipeline.inverter import Inverter

        # --inv-profiles names resolve through bench.INV_SERVE_PROFILES
        # (the gated serving dials); "bf16" is the exact reference row
        names = [n.strip() for n in args.inv_profiles.split(",")
                 if n.strip()]
        unknown = [n for n in names
                   if n != "bf16" and n not in bench.INV_SERVE_PROFILES]
        if unknown:
            ap.error(f"unknown --inv-profiles {unknown}; choices: bf16, "
                     + ", ".join(sorted(bench.INV_SERVE_PROFILES)))
        todo = [("inv_bf16", {}) if name == "bf16"
                else (f"inv_{name}", bench.INV_SERVE_PROFILES[name][0])
                for name in names]
        for label, over in todo:
            icfg = Config(cfg.to_dict())
            icfg["inversion"] = dict({
                "save_path": "/tmp/bench/latents", "prompt": "benchmark",
                "steps": args.steps, "save_steps": args.steps,
                "save_intermediate": False, "batch_size": 8,
                "force": True, "recon": False, "control": "none",
                "control_scale": 1.0, "n_frames": None, "quant": "none",
            }, **over)
            inv = Inverter(bundle, icfg)
            conds = inv.text(["benchmark prompt"] * args.frames)
            lat0 = jax.random.normal(
                jax.random.key(5), (args.frames, latent, latent, 4),
                jnp.bfloat16)
            # warm run compiles every executable the mode needs (full +
            # shallow cache phases etc.); the second run is the timing.
            # The warm run's wall is also recorded: bench.py times the
            # FIRST _run after a single-step warm, and r4 saw a 1.39-vs-
            # 2.64 f/s bench/race discrepancy — first_run_fps vs fps here
            # quantifies how much of that is first-run effects.
            t0 = time.time()
            warm = inv._run(jnp.copy(lat0), conds, None, None,
                            inversion=True)
            _ = float(jnp.sum(warm))
            first = args.frames / (time.time() - t0)
            t0 = time.time()
            out = inv._run(jnp.copy(lat0), conds, None, None,
                           inversion=True)
            _ = float(jnp.sum(out))
            results[label] = args.frames / (time.time() - t0)
            print(json.dumps({"profile": label,
                              "fps": round(results[label], 4),
                              "first_run_fps": round(first, 4)}))

    order = sorted((k for k in results if not k.startswith("inv")),
                   key=lambda k: -results[k])
    print(json.dumps({"ranking": [(k, round(results[k], 3))
                                  for k in order]}))
    if args.out:
        rec = {
            "frames": args.frames, "steps": args.steps, "size": args.size,
            "steps_per_block": args.block or 10,
            "backend": jax.devices()[0].platform,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "fps": {k: round(v, 4) for k, v in results.items()},
            "ranking": [(k, round(results[k], 3)) for k in order],
            "scope": "sample loop + decode per profile; inv_* rows are the "
                     "inversion DDIM loop only (second warm run)",
        }
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"[race] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
