"""Experiment: cross-attention (small KV) and merged self-attention variants.

Measures the FULL attention sub-block (projections + attention + output
projection) device-true, comparing:
  A. current: Dense + transpose to BHSD + flash kernel + transpose back
  B. einsum-packed BHSD + single-pass small-KV kernel (attn2) / flash (attn1)
  C. pure-XLA einsum attention in BHSD
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

from vidtome_tpu.ops.attention import flash_attention  # noqa: E402


def device_time(fn, *args, n=20):
    @jax.jit
    def loop(key, *args):
        def body(acc, i):
            out = fn(jax.random.fold_in(key, i), *args)
            return acc + jnp.sum(out).astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(n, dtype=jnp.int32))[0]
    key = jax.random.key(7)
    _ = float(loop(key, *args))
    t0 = time.time()
    _ = float(loop(key, *args))
    return (time.time() - t0) / n * 1e3


# ---------------------------------------------------------------------------
# Single-pass small-KV attention kernel: BHSD layout, kv padded to one tile.
# ---------------------------------------------------------------------------

def _small_kv_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, kv_len, kvp):
    q = q_ref[0, 0]          # [bq, D]
    k = k_ref[0, 0]          # [kvp, D]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    if kv_len < kvp:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    p = p / l
    o_ref[0, 0] = jax.lax.dot(p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32
                              ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_valid_len", "block_q"))
def small_kv_attention(q, k, v, kv_valid_len=None, block_q=2048):
    """q: [B, H, S, D]; k,v: [B, H, Skv, D] with Skv small (<= 512)."""
    B, H, S, D = q.shape
    Skv = k.shape[2]
    kvp = max(128, -(-Skv // 128) * 128)
    kv_len = Skv if kv_valid_len is None else kv_valid_len
    block_q = min(block_q, -(-S // 128) * 128)
    Sp = -(-S // block_q) * block_q
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, kvp - Skv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, kvp - Skv), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_small_kv_kernel, sm_scale=D ** -0.5,
                          kv_len=kv_len, kvp=kvp),
        out_shape=jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype),
        grid=(B, H, Sp // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, kvp, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, kvp, D), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, h, i: (b, h, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(qp, kp, vp)
    return out[:, :, :S, :]


def main():
    key = jax.random.key(0)
    B, S, C, H, D = 8, 4096, 320, 8, 40
    Skv = 77
    x = jax.random.normal(key, (B, S, C), jnp.bfloat16)
    ctx = jax.random.normal(key, (B, Skv, 768), jnp.bfloat16)
    Wq = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.02
    Wk = jax.random.normal(key, (768, C), jnp.bfloat16) * 0.02
    Wv = jax.random.normal(key, (768, C), jnp.bfloat16) * 0.02
    Wo = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.02

    def jiggle(kk, x):
        return x * (1 + 1e-9 * jax.random.uniform(kk)).astype(x.dtype)

    # A: current path
    def var_a(kk, x, ctx):
        x = jiggle(kk, x)
        q = (x @ Wq).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        k = (ctx @ Wk).reshape(B, Skv, H, D).transpose(0, 2, 1, 3)
        v = (ctx @ Wv).reshape(B, Skv, H, D).transpose(0, 2, 1, 3)
        o = flash_attention(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, C)
        return o @ Wo

    # B: einsum-packed BHSD + small-kv kernel
    Wq4 = Wq.reshape(C, H, D)
    Wk4 = Wk.reshape(768, H, D)
    Wv4 = Wv.reshape(768, H, D)
    Wo4 = Wo.reshape(H, D, C)

    def var_b(kk, x, ctx):
        x = jiggle(kk, x)
        q = jnp.einsum("bsc,chd->bhsd", x, Wq4)
        k = jnp.einsum("bsc,chd->bhsd", ctx, Wk4)
        v = jnp.einsum("bsc,chd->bhsd", ctx, Wv4)
        o = small_kv_attention(q, k, v, kv_valid_len=Skv)
        return jnp.einsum("bhsd,hdc->bsc", o, Wo4)

    # C: pure XLA in BHSD
    def var_c(kk, x, ctx):
        x = jiggle(kk, x)
        q = jnp.einsum("bsc,chd->bhsd", x, Wq4)
        k = jnp.einsum("bsc,chd->bhsd", ctx, Wk4)
        v = jnp.einsum("bsc,chd->bhsd", ctx, Wv4)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * D ** -0.5
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        return jnp.einsum("bhsd,hdc->bsc", o, Wo4)

    # numerics parity
    oa = var_a(key, x, ctx)
    ob = var_b(key, x, ctx)
    oc = var_c(key, x, ctx)
    print("max|A-B|:", float(jnp.max(jnp.abs(oa - ob))),
          " max|A-C|:", float(jnp.max(jnp.abs(oa - oc))))

    print(f"attn2 A (current):   {device_time(var_a, x, ctx):.3f}ms")
    print(f"attn2 B (small-kv):  {device_time(var_b, x, ctx):.3f}ms")
    print(f"attn2 C (xla bhsd):  {device_time(var_c, x, ctx):.3f}ms")

    # ----- attn1 merged self-attention: [2, 5325, 320] tokens ------
    M = 5325
    xm = jax.random.normal(key, (2, M, C), jnp.bfloat16)

    def self_a(kk, xm):
        xm = jiggle(kk, xm)
        q = (xm @ Wq).reshape(2, M, H, D).transpose(0, 2, 1, 3)
        k = (xm @ Wk[:C]).reshape(2, M, H, D).transpose(0, 2, 1, 3)
        v = (xm @ Wv[:C]).reshape(2, M, H, D).transpose(0, 2, 1, 3)
        o = flash_attention(q, k, v)
        return o.transpose(0, 2, 1, 3).reshape(2, M, C) @ Wo

    Wk4c = Wk[:C].reshape(C, H, D)
    Wv4c = Wv[:C].reshape(C, H, D)

    def self_b(kk, xm, bq, bk):
        xm = jiggle(kk, xm)
        q = jnp.einsum("bsc,chd->bhsd", xm, Wq4)
        k = jnp.einsum("bsc,chd->bhsd", xm, Wk4c)
        v = jnp.einsum("bsc,chd->bhsd", xm, Wv4c)
        o = flash_attention(q, k, v, block_q=bq, block_k=bk)
        return jnp.einsum("bhsd,hdc->bsc", o, Wo4)

    print(f"attn1 A (current):       {device_time(self_a, xm):.3f}ms")
    for bq, bk in [(1024, 1024), (512, 1024), (1024, 512), (2048, 1024),
                   (1024, 2048), (512, 2048), (2048, 512)]:
        f = functools.partial(self_b, bq=bq, bk=bk)
        print(f"attn1 B einsum bq={bq} bk={bk}: {device_time(f, xm):.3f}ms")


if __name__ == "__main__":
    main()
