"""Does a bigger frame batch raise UNet MFU?  The inversion stage batches
independent frames (micro-batch 8 today); if MXU utilization grows with
batch, raising inversion batch_size is a free throughput win.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_batch_mfu.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

from vidtome_tpu.models.registry import init_model

V5E_PEAK = 197e12


def main():
    bundle = init_model(sd_version="1.5", weight_dtype="bf16")
    unet = bundle.make_unet(tome=None)
    params = bundle.unet_params
    ctx1 = jax.random.normal(jax.random.key(1), (1, 77, 768), jnp.bfloat16)

    for B in (8, 16, 32):
        x = jax.random.normal(jax.random.key(0), (B, 64, 64, 4),
                              jnp.bfloat16)
        ctx = jnp.tile(ctx1, (B, 1, 1))

        @jax.jit
        def loop(params, x, ctx):
            def body(acc, i):
                out = unet.apply({"params": params},
                                 x * (1 + 1e-9 * i.astype(jnp.bfloat16)),
                                 jnp.asarray(500), ctx)
                return acc + jnp.sum(out).astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(8, dtype=jnp.int32))
            return acc

        ca = loop.lower(params, x, ctx).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        # XLA cost analysis counts a scan body ONCE regardless of trip
        # count — the loop runs it 8x, so total executed FLOPs = 8x this.
        flops = float(ca.get("flops", 0.0)) * 8
        _ = float(loop(params, x, ctx))  # compile+warm
        t0 = time.time()
        _ = float(loop(params, x, ctx))
        dt = time.time() - t0
        tfs = flops / dt / 1e12
        print(f"B={B:3d}: {dt/8*1e3:7.1f} ms/fwd  "
              f"{flops/8/B/1e12:.3f} TFLOP/frame  {tfs:6.1f} TF/s  "
              f"{tfs*1e12/V5E_PEAK:5.1%} MFU")


if __name__ == "__main__":
    main()
