"""Experiment round 3: flash kernel VPU-pass reduction.

Changes vs the shipped kernel at [2,8,5325,40]:
  v2: sm_scale folded into q outside; KV-pad mask only on the last tile
      (lax.cond); exp computed on bf16 (s-m), feeding the PV matmul
      directly without a separate astype pass.
  v2h: v2 + hf=2 head folding.
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

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


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


def _v2_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
               kv_len, block_k, num_kv_tiles, needs_mask, cond_mask,
               bf16_p):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, D] (pre-scaled by sm_scale)
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [bq, bk]

    if needs_mask:
        col = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        if cond_mask:
            def masked():
                return jnp.where(col < kv_len, s, _NEG_INF)

            s = jax.lax.cond(kv_idx == num_kv_tiles - 1, masked, lambda: s)
        else:
            s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])
    if bf16_p:
        p = jnp.exp((s - m_next[:, :1]).astype(jnp.bfloat16))
    else:
        p = jnp.exp(s - m_next[:, :1]).astype(jnp.bfloat16)
    l_scr[...] = alpha * l_prev + jnp.sum(
        p, axis=1, keepdims=True, dtype=jnp.float32)
    m_scr[...] = m_next

    pv = jax.lax.dot(p, v_ref[0], preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        l = l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "cond_mask", "bf16_p"))
def flash_v2(q, k, v, block_q=1024, block_k=1024, cond_mask=False,
             bf16_p=False):
    B, H, S, D = q.shape
    q = q * (D ** -0.5)
    Sp = -(-S // block_q) * block_q
    Skp = -(-S // block_k) * block_k
    qf = jnp.pad(q, ((0, 0), (0, 0), (0, Sp - S), (0, 0))).reshape(
        B * H, Sp, D)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, Skp - S), (0, 0))).reshape(
        B * H, Skp, D)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, Skp - S), (0, 0))).reshape(
        B * H, Skp, D)
    num_kv = Skp // block_k
    out = pl.pallas_call(
        functools.partial(_v2_kernel, kv_len=S, block_k=block_k,
                          num_kv_tiles=num_kv, needs_mask=S < Skp,
                          cond_mask=cond_mask, bf16_p=bf16_p),
        out_shape=jax.ShapeDtypeStruct((B * H, Sp, D), q.dtype),
        grid=(B * H, Sp // block_q, num_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf)
    return out.reshape(B, H, Sp, D)[:, :, :S, :]


def main():
    key = jax.random.key(0)
    for (name, H, D, M) in [("L0", 8, 40, 5325), ("L0g", 8, 40, 6390),
                            ("L1", 8, 80, 1597)]:
        q = jax.random.normal(key, (2, H, M, D), jnp.bfloat16)

        def jig(kk, x):
            return x * (1 + 1e-9 * jax.random.uniform(kk)).astype(x.dtype)

        ref = flash_attention(q, q, q)
        base = device_time(lambda kk, q=q: flash_attention(jig(kk, q), q, q))
        print(f"{name} base: {base:.3f}ms")
        for cm, bp, tag in [(False, False, "scale-fold only"),
                            (False, True, "+bf16 exp"),
                            (True, False, "+cond mask"),
                            (True, True, "+both")]:
            got = flash_v2(q, q, q, cond_mask=cm, bf16_p=bp)
            err = float(jnp.max(jnp.abs(got - ref)))
            ms = device_time(lambda kk, q=q, cm=cm, bp=bp: flash_v2(
                jig(kk, q), q, q, cond_mask=cm, bf16_p=bp))
            print(f"{name} v2 {tag}: {ms:.3f}ms (err {err:.4f})")


if __name__ == "__main__":
    main()
