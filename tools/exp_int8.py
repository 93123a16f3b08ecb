"""Microbench: is s8 x s8 -> s32 actually ~2x bf16 on v5e via XLA?

Answers three questions before building the quantized serving path:
  1. raw dot_general int8 vs bf16 throughput at production matmul shapes;
  2. raw conv_general_dilated int8 vs bf16 at production conv shapes;
  3. the W8A8 pattern end-to-end (dynamic act quant -> int8 op -> dequant
     + bias) vs the plain bf16 op, i.e. including the quantize/dequant
     bandwidth overhead the serving path will pay.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_int8.py
(n >= 300 scan iterations per the tunneled-backend measurement rules;
the loop body's input depends on the previous output through a traced
select so XLA cannot hoist the op out of the scan.)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

N_ITERS = 300


def _dep(x, carry):
    """Make ``x`` depend on ``carry`` without changing its value: a traced
    (always-false in practice) predicate selects a perturbed first row.
    Constant folding cannot remove it, so the scanned op stays in the
    loop."""
    if carry is None:
        return x
    flag = jnp.reshape(carry, (-1,))[0].astype(jnp.float32) > 1e30
    row = x[:1]
    bump = row ^ jnp.ones_like(row) if x.dtype == jnp.int8 else row + 1
    row = jnp.where(flag, bump, row)
    return jax.lax.dynamic_update_slice(x, row, (0,) * x.ndim)


def scanned(body):
    @jax.jit
    def run(*args):
        def step(carry, _):
            return body(*args, carry), ()

        carry0 = body(*args, None)
        carry, _ = jax.lax.scan(step, carry0, None, length=N_ITERS)
        return carry

    return run


def timed(fn, *args):
    out = fn(*args)  # compile + warm
    out.block_until_ready()
    t0 = time.time()
    out = fn(*args)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))  # force via fetch
    return (time.time() - t0) / N_ITERS * 1e3  # ms per iter


def bench_dot(M, K, N):
    x = jax.random.normal(jax.random.key(0), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (K, N), jnp.bfloat16)
    xq = (x * 10).astype(jnp.int8)
    wq = (w * 10).astype(jnp.int8)
    wscale = jnp.abs(w.astype(jnp.float32)).max(axis=0) / 127.0

    def f_bf16(x, w, carry):
        return jnp.dot(_dep(x, carry), w,
                       preferred_element_type=jnp.bfloat16)

    def f_int8_raw(xq, wq, carry):
        return jax.lax.dot_general(_dep(xq, carry), wq,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def f_w8a8(x, wq, wscale, carry):
        x = _dep(x, carry)
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                       keepdims=True)
        s = jnp.maximum(amax, 1e-6) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127,
                     127).astype(jnp.int8)
        y = jax.lax.dot_general(q, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (s * wscale[None, :])).astype(
            jnp.bfloat16)

    t_bf = timed(scanned(f_bf16), x, w)
    t_i8 = timed(scanned(f_int8_raw), xq, wq)
    t_w8a8 = timed(scanned(f_w8a8), x, wq, wscale)
    fl = 2 * M * K * N
    print(f"dot {M}x{K}x{N}: bf16 {t_bf:.3f}ms ({fl/t_bf/1e9:.0f} TF/s) | "
          f"int8-raw {t_i8:.3f}ms ({fl/t_i8/1e9:.0f} TOP/s) | "
          f"w8a8 {t_w8a8:.3f}ms ({fl/t_w8a8/1e9:.0f} eff TF/s) | "
          f"raw {t_bf/t_i8:.2f}x, e2e {t_bf/t_w8a8:.2f}x", flush=True)


def bench_conv(B, H, W, Cin, Cout, k=3):
    x = jax.random.normal(jax.random.key(0), (B, H, W, Cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (k, k, Cin, Cout),
                          jnp.bfloat16) * 0.1
    xq = (x * 10).astype(jnp.int8)
    wq = (w * 100).astype(jnp.int8)
    wscale = jnp.abs(w.astype(jnp.float32)).max(axis=(0, 1, 2)) / 127.0
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = [(k // 2, k // 2)] * 2

    def f_bf16(x, w, carry):
        return jax.lax.conv_general_dilated(
            _dep(x, carry), w, (1, 1), pad, dimension_numbers=dn,
            preferred_element_type=jnp.bfloat16)

    def f_int8_raw(xq, wq, carry):
        return jax.lax.conv_general_dilated(
            _dep(xq, carry), wq, (1, 1), pad, dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    def f_w8a8(x, wq, wscale, carry):
        x = _dep(x, carry)
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3),
                       keepdims=True)
        s = jnp.maximum(amax, 1e-6) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127,
                     127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            q, wq, (1, 1), pad, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (s * wscale)).astype(jnp.bfloat16)

    fl = 2 * B * H * W * Cin * Cout * k * k
    t_bf = timed(scanned(f_bf16), x, w)
    try:
        t_i8 = timed(scanned(f_int8_raw), xq, wq)
    except Exception as e:  # int8 conv may not lower on all backends
        print(f"conv {B}x{H}x{W}x{Cin}->{Cout}: bf16 {t_bf:.3f}ms; "
              f"int8 conv FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return
    t_w8a8 = timed(scanned(f_w8a8), x, wq, wscale)
    print(f"conv {B}x{H}x{W}x{Cin}->{Cout}: bf16 {t_bf:.3f}ms "
          f"({fl/t_bf/1e9:.0f} TF/s) | int8-raw {t_i8:.3f}ms "
          f"({fl/t_i8/1e9:.0f} TOP/s) | w8a8 {t_w8a8:.3f}ms | "
          f"raw {t_bf/t_i8:.2f}x, e2e {t_bf/t_w8a8:.2f}x", flush=True)


def main():
    print(f"backend: {jax.default_backend()}, {jax.devices()[0]}")
    # Production matmul shapes (512p, chunk 4, 2 CFG lanes, merged seqs):
    bench_dot(8 * 4096, 320, 320)      # L0 qkv/out proj (unmerged rows)
    bench_dot(8 * 4096, 320, 2560)     # L0 ff proj_in (GEGLU 2x)
    bench_dot(8 * 4096, 1280, 320)     # L0 ff proj_out
    bench_dot(8 * 1024, 640, 640)      # L1 qkv
    bench_dot(8 * 1024, 640, 5120)     # L1 ff in
    bench_dot(8 * 256, 1280, 1280)     # L2 qkv
    # Production conv shapes (latent 64, B = lanes*frames = 8):
    bench_conv(8, 64, 64, 320, 320)    # L0 resnet conv
    bench_conv(8, 32, 32, 640, 640)    # L1 resnet conv
    bench_conv(8, 16, 16, 1280, 1280)  # L2 resnet conv
    bench_conv(8, 8, 8, 1280, 1280)    # L3 resnet conv
    bench_conv(8, 64, 64, 960, 320)    # up-block skip-concat conv


if __name__ == "__main__":
    main()
