"""Inversion batch-size sweep (VERDICT round-2 item 7).

Inversion is 34% of the end-to-end edit wall; frames are embarrassingly
parallel, so the micro-batch size only trades compile-shape count vs
per-dispatch MXU utilization.  Times the production `Inverter._run`
(scan over frame micro-batches, donated buffer) at batch 8/16/32 on the
32-frame 512p / 50-step workload.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_inv_batch.py
"""

from __future__ import annotations

import sys
import time

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vidtome_tpu.config import Config  # noqa: E402
from vidtome_tpu.models.registry import init_model  # noqa: E402
from vidtome_tpu.pipeline.inverter import Inverter  # noqa: E402


def main():
    frames, steps, size = 32, 50, 512
    latent = size // 8
    bundle = init_model(sd_version="1.5", weight_dtype="bf16")
    for bs in (8, 16, 32):
        cfg = Config({
            "sd_version": "1.5", "height": size, "width": size,
            "seed": 123, "work_dir": "/tmp/bench",
            "float_precision": "bf16",
            "inversion": {
                "save_path": "/tmp/bench/latents", "prompt": "sweep",
                "steps": steps, "save_steps": steps,
                "save_intermediate": False, "batch_size": bs,
                "force": True, "recon": False, "control": "none",
                "control_scale": 1.0, "n_frames": None,
            },
        })
        inv = Inverter(bundle, cfg)
        conds = inv.text(["sweep prompt"] * frames)
        lat = jax.random.normal(jax.random.key(5),
                                (frames, latent, latent, 4), jnp.bfloat16)
        t0 = time.time()
        warm, _d = inv._full_step(inv._params, jnp.copy(lat), inv._tables,
                                  jnp.asarray(0, jnp.int32), True, conds,
                                  None, None,
                                  jnp.zeros((), jnp.bfloat16))
        _ = float(jnp.sum(warm))
        print(f"bs={bs}: compile {time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        out = inv._run(lat, conds, None, None, inversion=True)
        _ = float(jnp.sum(out))
        dt = time.time() - t0
        print(f"bs={bs}: {frames} frames x {steps} steps in {dt:.2f}s "
              f"= {frames / dt:.3f} frames/s", flush=True)


if __name__ == "__main__":
    main()
