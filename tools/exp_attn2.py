"""Experiment round 2: merged self-attention kernel redesign.

Variants at the real merged shape [2, 5325, 320] (H=8, D=40):
  base  : current flash kernel (bq=bk=1024)
  hfold : fold `hf` heads into each grid step (grid overhead / hf)
  hfold + bf16 p, single-lane stats ops
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


def _hfold_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  sm_scale, kv_len, block_k, num_kv_tiles, needs_mask, hf):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [hf, bq, D]
    k = k_ref[0]  # [hf, bk, D]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # [hf, bq, bk]
    if needs_mask:
        col = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                          s.shape, 2)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[...]  # [hf, bq, 128]
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=2, keepdims=True)  # [hf, bq, 1]
    m_next = jnp.maximum(m_prev, m_curr)  # broadcasts over lanes
    alpha = jnp.exp(m_prev[..., :1] - m_next[..., :1])  # [hf, bq, 1]
    p = jnp.exp(s - m_next[..., :1])
    l_scr[...] = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
    m_scr[...] = m_next

    v = v_ref[0]  # [hf, bk, D]
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [hf, bq, D]
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        l = l_scr[...][..., :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "hf"))
def hfold_attention(q, k, v, block_q=1024, block_k=1024, hf=2):
    """q,k,v: [BH, S, D] with BH divisible by hf."""
    BH, S, D = q.shape
    Sp = -(-S // block_q) * block_q
    Skp = -(-S // block_k) * block_k
    qp = jnp.pad(q, ((0, 0), (0, Sp - S), (0, 0))).reshape(
        BH // hf, hf, Sp, D)
    kp = jnp.pad(k, ((0, 0), (0, Skp - S), (0, 0))).reshape(
        BH // hf, hf, Skp, D)
    vp = jnp.pad(v, ((0, 0), (0, Skp - S), (0, 0))).reshape(
        BH // hf, hf, Skp, D)
    num_kv = Skp // block_k
    out = pl.pallas_call(
        functools.partial(_hfold_kernel, sm_scale=D ** -0.5, kv_len=S,
                          block_k=block_k, num_kv_tiles=num_kv,
                          needs_mask=S < Skp, hf=hf),
        out_shape=jax.ShapeDtypeStruct((BH // hf, hf, Sp, D), q.dtype),
        grid=(BH // hf, Sp // block_q, num_kv),
        in_specs=[
            pl.BlockSpec((1, hf, block_q, D), lambda b, i, j: (b, 0, i, 0)),
            pl.BlockSpec((1, hf, block_k, D), lambda b, i, j: (b, 0, j, 0)),
            pl.BlockSpec((1, hf, block_k, D), lambda b, i, j: (b, 0, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, hf, block_q, D),
                               lambda b, i, j: (b, 0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((hf, block_q, 128), jnp.float32),
            pltpu.VMEM((hf, block_q, 128), jnp.float32),
            pltpu.VMEM((hf, block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp)
    return out.reshape(BH, Sp, D)[:, :S, :]


def main():
    key = jax.random.key(0)
    H, D, M = 8, 40, 5325
    q = jax.random.normal(key, (2, H, M, D), jnp.bfloat16)
    qf = q.reshape(2 * H, M, D)

    def jig(kk, x):
        return x * (1 + 1e-9 * jax.random.uniform(kk)).astype(x.dtype)

    ref = flash_attention(q, q, q)
    base = device_time(lambda kk, q=q: flash_attention(jig(kk, q), q, q))
    print(f"base flash (bq=bk=1024): {base:.3f}ms")
    for hf in (1, 2, 4):
        for bq, bk in [(1024, 1024), (512, 1024), (1024, 512), (512, 512)]:
            try:
                got = hfold_attention(qf, qf, qf, block_q=bq, block_k=bk,
                                      hf=hf)
                err = float(jnp.max(jnp.abs(
                    got.reshape(2, H, M, D) - ref)))
                ms = device_time(
                    lambda kk, qf=qf, bq=bq, bk=bk, hf=hf: hfold_attention(
                        jig(kk, qf), qf, qf, block_q=bq, block_k=bk, hf=hf))
                print(f"hfold hf={hf} bq={bq} bk={bk}: {ms:.3f}ms "
                      f"(err {err:.4f})")
            except Exception as e:
                print(f"hfold hf={hf} bq={bq} bk={bk}: FAIL "
                      f"{str(e).splitlines()[0][:80]}")

    # L1 shape too
    M1, D1 = 1597, 80
    q1 = jax.random.normal(key, (2, H, M1, D1), jnp.bfloat16)
    q1f = q1.reshape(2 * H, M1, D1)
    base = device_time(lambda kk, q=q1: flash_attention(jig(kk, q), q, q))
    print(f"L1 base flash: {base:.3f}ms")
    for hf in (2, 4, 8):
        ms = device_time(
            lambda kk, qf=q1f, hf=hf: hfold_attention(
                jig(kk, qf), qf, qf, block_q=1024, block_k=1024, hf=hf))
        print(f"L1 hfold hf={hf}: {ms:.3f}ms")


if __name__ == "__main__":
    main()
