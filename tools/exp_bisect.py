"""Bisect the in-graph cost of one merge-mode chunk forward by knocking out
one subsystem at a time (shape-preserving stubs):

  base    real chunk forward
  noga    merge/unmerge gathers -> slices/broadcasts (same shapes, no
          random-access gathers)
  noattn  attention -> identity on q (removes flash kernels + xattn math)
  nomatch matching -> fixed arange plans (removes cosine-sim matmul + topk)

The deltas vs base give the true in-context cost of gathers, attention and
matching (microbenchmarks over-estimate: XLA overlaps/fuses in context).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_bisect.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

from vidtome_tpu.core import merge as M
from vidtome_tpu.models.registry import init_model
from vidtome_tpu.models.tome import ToMeCall, ToMeConfig
from vidtome_tpu.ops import attention as A


def device_time(fn, *args, n=10):
    @jax.jit
    def loop(key, *args):
        def body(acc, i):
            out = fn(jax.random.fold_in(key, i), *args)
            return acc + jnp.sum(out).astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(n, dtype=jnp.int32))
        return acc

    key = jax.random.key(7)
    _ = float(loop(key, *args))
    t0 = time.time()
    _ = float(loop(key, *args))
    return (time.time() - t0) / n * 1e3


def run_variant(bundle, x, ctx, name):
    tome = ToMeConfig(frames=4, local_merge_ratio=0.9, merge_global=True,
                      global_merge_ratio=0.8, share_match=True)
    unet = bundle.make_unet(tome=tome)
    params = bundle.unet_params
    key = jax.random.key(0)

    @jax.jit
    def init_banks(params, x, ctx, k):
        return unet.apply({"params": params}, x, jnp.asarray(500), ctx,
                          tome_call=ToMeCall(key=k, bank_mode="init"),
                          num_lanes=2, mutable=["tome_bank"])[1]

    banks = init_banks(params, x, ctx, key)

    def fwd(kk, params, x, ctx, banks):
        out, _ = unet.apply({"params": params, "tome_bank": banks}, x,
                            jnp.asarray(500), ctx,
                            tome_call=ToMeCall(key=kk, bank_mode="merge"),
                            num_lanes=2, mutable=["tome_bank"])
        return out

    ms = device_time(fwd, params, x, ctx, banks)
    print(f"chunk fwd [{name}]: {ms:.2f}ms")
    return ms


def main():
    key = jax.random.key(0)
    bundle = init_model(sd_version="1.5", weight_dtype="bf16")
    x = jax.random.normal(key, (8, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (8, 77, 768), jnp.bfloat16)

    base = run_variant(bundle, x, ctx, "base")

    # ---- noga: gathers -> slices / broadcasts --------------------------
    orig_merge, orig_unmerge = M.merge, M.unmerge

    def fake_merge(x, plan, mode="replace"):
        return x[:, : plan.merged_len]

    def fake_unmerge(y, plan):
        reps = -(-plan.seq_len // y.shape[1])
        return jnp.tile(y, (1, reps, 1))[:, : plan.seq_len]

    M.merge, M.unmerge = fake_merge, fake_unmerge
    import vidtome_tpu.models.layers as L

    # layers.py imported merge_ops as module ref — same module object, the
    # monkeypatch is visible there.
    noga = run_variant(bundle, x, ctx, "noga")
    M.merge, M.unmerge = orig_merge, orig_unmerge

    # ---- noattn: attention -> identity ---------------------------------
    orig_attn = A.attention

    def fake_attention(q, k, v, **kw):
        return q

    A.attention = fake_attention
    L.attention = fake_attention  # layers.py binds the name at import
    noattn = run_variant(bundle, x, ctx, "noattn")
    A.attention = orig_attn
    L.attention = orig_attn

    # ---- nomatch: matching -> fixed arange plans ------------------------
    orig_local, orig_two = M.local_matching, M.two_set_matching

    def fake_plan(B, N, S, D, r):
        U = S - r
        a_idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
        b_idx = jnp.broadcast_to(S + jnp.arange(D, dtype=jnp.int32), (B, D))
        unm = jnp.broadcast_to(jnp.arange(U, dtype=jnp.int32), (B, U))
        mg = jnp.concatenate([a_idx[:, :U], b_idx], 1)
        inv = jnp.broadcast_to(
            jnp.concatenate([jnp.arange(U, dtype=jnp.int32),
                             jnp.zeros((S - U,), jnp.int32),
                             U + jnp.arange(D, dtype=jnp.int32)]), (B, N))
        return M.MergePlan(mg, inv, a_idx, b_idx, None, None, unm)

    def fake_local(metric, F, ratio, unm_pre, key, target_stride=4,
                   align_batch=False, keep_sorted_indices=False,
                   use_fused=None, len_quantum=None):
        B, N, _ = metric.shape
        if ratio <= 0 or F < 2:
            return None
        tnum = (N - unm_pre) // F
        stride = M._round_stride(F, target_stride)
        ndf = F // stride
        S = (F - ndf) * tnum
        D = N - S
        r = min(S, int(S * ratio))
        r = M.quantize_r(S, r, D, len_quantum)
        return fake_plan(B, N, S, D, r)

    def fake_two(metric, src_len, ratio, align_batch=False,
                 keep_sorted_indices=False, use_fused=None,
                 len_quantum=None):
        B, N, _ = metric.shape
        S = src_len
        D = N - S
        r = min(S, int(S * ratio))
        r = M.quantize_r(S, r, D, len_quantum)
        return fake_plan(B, N, S, D, r)

    M.local_matching, M.two_set_matching = fake_local, fake_two
    nomatch = run_variant(bundle, x, ctx, "nomatch")
    M.local_matching, M.two_set_matching = orig_local, orig_two

    print(f"\nattribution (of {base:.1f}ms):")
    print(f"  gathers : {base - noga:6.2f}ms")
    print(f"  attn    : {base - noattn:6.2f}ms")
    print(f"  matching: {base - nomatch:6.2f}ms")
    print(f"  rest    : {noga + noattn + nomatch - 2 * base:6.2f}ms")


if __name__ == "__main__":
    main()
