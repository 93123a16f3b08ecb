"""Microbenchmark of the generation hot path on the real TPU.

Per-dispatch overhead through the axon tunnel is ~5ms, so naive
per-call timing lies for sub-10ms ops.  Every measurement here runs the op
N times inside ONE jitted lax.scan (input perturbed per iteration so XLA
cannot hoist it) and divides: one dispatch, one forced fetch, device-true
per-iteration time.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_hotpath.py
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

N_ITERS = 20


def device_time(fn, *args, n=N_ITERS):
    """fn(key, *args) -> pytree.  Returns per-iteration ms, device-true."""

    @jax.jit
    def loop(key, *args):
        def body(acc, i):
            out = fn(jax.random.fold_in(key, i), *args)
            s = sum(jnp.sum(leaf).astype(jnp.float32)
                    for leaf in jax.tree.leaves(out)
                    if jnp.issubdtype(leaf.dtype, jnp.number))
            return acc + s, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(n, dtype=jnp.int32))
        return acc

    key = jax.random.key(7)
    _ = float(loop(key, *args))  # compile + warm
    t0 = time.time()
    _ = float(loop(key, *args))
    return (time.time() - t0) / n * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip-unet", action="store_true")
    args = p.parse_args()

    from vidtome_tpu.core import merge as M
    from vidtome_tpu.ops.attention import flash_attention, reference_attention

    key = jax.random.key(0)

    # ------------------------------------------------------------------
    # Attention at real merged shapes (512p, chunk 4, B=2 CFG lanes)
    # ------------------------------------------------------------------
    for (lvl, Hh, Dd, Mm) in [("L0-global ", 8, 40, 6390),
                              ("L0-local  ", 8, 40, 5325),
                              ("L1-global ", 8, 80, 1597),
                              ("L0-xattn  ", 8, 40, 16384)]:
        if lvl.startswith("L0-xattn"):
            q = jax.random.normal(key, (8, Hh, 4096, Dd), jnp.bfloat16)
            kv = jax.random.normal(key, (8, Hh, 77, Dd), jnp.bfloat16)

            def f(k, q, kv):
                return flash_attention(q + 0 * k[0, 0, 0, 0], kv, kv)

            def fx(k, q, kv):
                return reference_attention(q + 0 * k[0, 0, 0, 0], kv, kv)

            def mk(kk):
                return jax.random.normal(kk, (8, Hh, 4096, Dd), jnp.bfloat16)

            ms_p = device_time(lambda kk, q=q, kv=kv: f(mk(kk), q, kv))
            ms_x = device_time(lambda kk, q=q, kv=kv: fx(mk(kk), q, kv))
            flops = 2 * 8 * Hh * 4096 * 77 * Dd * 2
        else:
            q = jax.random.normal(key, (2, Hh, Mm, Dd), jnp.bfloat16)

            def f(kk, q):
                qq = q * (1 + 1e-9 * jax.random.uniform(kk))
                return flash_attention(qq, qq, qq)

            def fx(kk, q):
                qq = q * (1 + 1e-9 * jax.random.uniform(kk))
                return reference_attention(qq, qq, qq)

            ms_p = device_time(f, q)
            ms_x = device_time(fx, q)
            flops = 2 * 2 * Hh * Mm * Mm * Dd * 2
        print(f"attn {lvl}: pallas {ms_p:6.2f}ms ({flops/ms_p/1e9:6.1f} TF/s)"
              f"  xla {ms_x:6.2f}ms ({flops/ms_x/1e9:6.1f} TF/s)")

    # ------------------------------------------------------------------
    # Matching
    # ------------------------------------------------------------------
    x0 = jax.random.normal(key, (2, 16384, 320), jnp.bfloat16)
    x1 = jax.random.normal(key, (2, 4096, 640), jnp.bfloat16)

    def local_match(kk, x):
        merged, plans = M.compute_local_merge(
            x * (1 + 1e-9 * jax.random.uniform(kk)), 4, 0.9, kk,
            target_stride=4)
        return merged, [p.merge_gather for p in plans]

    print(f"local match+merge L0 [2,16384,320]: "
          f"{device_time(local_match, x0):.2f}ms")
    print(f"local match+merge L1 [2,4096,640]:  "
          f"{device_time(local_match, x1):.2f}ms")

    cat = jax.random.normal(key, (2, 2 * 5325, 320), jnp.bfloat16)

    def global_match(kk, x):
        x = x * (1 + 1e-9 * jax.random.uniform(kk))
        plan = M.two_set_matching(x, src_len=5325, ratio=0.8)
        return M.merge(x, plan), plan.merge_gather

    print(f"global match+merge L0 [2,10650,320]: "
          f"{device_time(global_match, cat):.2f}ms")

    from vidtome_tpu.ops import matching as match_ops

    mnorm = x0 / jnp.linalg.norm(x0.astype(jnp.float32), axis=-1,
                                 keepdims=True).astype(jnp.bfloat16)
    src, dst = mnorm[:, :12288], mnorm[:, 12288:]

    def bm_ref(kk, s, d):
        return match_ops.best_match_reference(
            s * (1 + 1e-9 * jax.random.uniform(kk)), d)

    def bm_pl(kk, s, d):
        return match_ops.best_match(
            s * (1 + 1e-9 * jax.random.uniform(kk)), d)

    print(f"  best_match XLA:    {device_time(bm_ref, src, dst):.2f}ms")
    print(f"  best_match pallas: {device_time(bm_pl, src, dst):.2f}ms")

    nm = jax.random.normal(key, (2, 12288), jnp.float32)

    def topk(kk, nm):
        return jax.lax.top_k(-(nm + 1e-9 * jax.random.uniform(kk)), 1229)[1]

    def argsortf(kk, nm):
        return jnp.argsort(-(nm + 1e-9 * jax.random.uniform(kk)), axis=-1)

    print(f"  top_k(1229/12288): {device_time(topk, nm):.2f}ms")
    print(f"  argsort 12288:     {device_time(argsortf, nm):.2f}ms")

    idx = jax.random.randint(key, (2, 5325), 0, 16384)
    inv = jax.random.randint(key, (2, 16384), 0, 5325)
    y = jax.random.normal(key, (2, 5325, 320), jnp.bfloat16)

    def gather(kk, x, idx):
        return jnp.take_along_axis(x * (1 + 1e-9 * jax.random.uniform(kk)),
                                   idx[..., None], axis=1)

    print(f"  merge gather 16k->5.3k:   {device_time(gather, x0, idx):.2f}ms")
    print(f"  unmerge gather 5.3k->16k: {device_time(gather, y, inv):.2f}ms")

    if args.skip_unet:
        return

    # ------------------------------------------------------------------
    # Full chunk forward (one UNet apply, merge-bank mode)
    # ------------------------------------------------------------------
    from vidtome_tpu.models.registry import init_model
    from vidtome_tpu.models.tome import ToMeCall, ToMeConfig

    bundle = init_model(sd_version="1.5", weight_dtype="bf16")
    x = jax.random.normal(key, (8, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (8, 77, 768), jnp.bfloat16)
    params = bundle.unet_params

    for share in (False, True):
        tome = ToMeConfig(frames=4, local_merge_ratio=0.9, merge_global=True,
                          global_merge_ratio=0.8, share_match=share)
        unet = bundle.make_unet(tome=tome)

        @jax.jit
        def init_banks(params, x, ctx, k):
            return unet.apply(
                {"params": params}, x, jnp.asarray(500), ctx,
                tome_call=ToMeCall(key=k, bank_mode="init"),
                num_lanes=2, mutable=["tome_bank"])[1]

        banks = init_banks(params, x, ctx, key)

        def fwd_merge(kk, params, x, ctx, banks):
            out, b = unet.apply(
                {"params": params, "tome_bank": banks}, x, jnp.asarray(500),
                ctx, tome_call=ToMeCall(key=kk, bank_mode="merge"),
                num_lanes=2, mutable=["tome_bank"])
            return out

        def fwd_off(kk, params, x, ctx):
            return unet.apply(
                {"params": params}, x, jnp.asarray(500), ctx,
                tome_call=ToMeCall(key=kk, bank_mode="off"), num_lanes=2)

        ms_m = device_time(fwd_merge, params, x, ctx, banks, n=10)
        ms_o = device_time(fwd_off, params, x, ctx, n=10)
        print(f"chunk fwd share_match={share}: merge {ms_m:.2f}ms  "
              f"local-only {ms_o:.2f}ms")

    # no-merge UNet for reference (what pure attention-over-frames costs)
    unet_plain = bundle.make_unet(tome=None)

    def fwd_plain(kk, params, x, ctx):
        return unet_plain.apply({"params": params},
                                x * (1 + 1e-9 * jax.random.uniform(kk)),
                                jnp.asarray(500), ctx)

    print(f"chunk fwd no-merge: {device_time(fwd_plain, params, x, ctx, n=10):.2f}ms")


if __name__ == "__main__":
    main()
