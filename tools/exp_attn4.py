"""Flash-attention kernel v2 candidates for head_dim-40 SD attention.

The production kernel measures ~21 TF/s: at D=40 the MXU matmuls are cheap
and the per-tile VPU softmax work (row max, exp, row sum, rescales)
dominates.  Candidates:

  v1  current kernel (running max + VPU row sums)
  v2a ones-column: row sums of p ride the PV matmul (append a ones column
      to v) — removes the VPU sum reduce and the separate l scratch
  v2b norm-bound: replace the running max with the static bound
      m = ||q_row|| * max||k|| (Cauchy-Schwarz, >= true max) — removes the
      max reduce, the m scratch, and the acc rescale entirely
  v2c v2b + bf16 exp

Accuracy is checked against the jnp oracle.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_attn4.py
"""

from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

from vidtome_tpu.ops.attention import flash_attention, reference_attention

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
N_ITERS = 20


def device_time(fn, *args, n=N_ITERS):
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


# --------------------------------------------------------------------------
# v2a: running max kept, p row-sums via ones-column in the PV matmul
# --------------------------------------------------------------------------


def _kernel_v2a(q_ref, k_ref, vaug_ref, o_ref, m_scr, acc_scr, *,
                num_kv_tiles: int, D: int):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    m_prev = m_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    alpha = jnp.exp(m_prev - m_next)
    m_scr[...] = m_next

    p = jnp.exp(s - jnp.broadcast_to(m_next[:, :1], s.shape))
    pv = jax.lax.dot(p.astype(vaug_ref.dtype), vaug_ref[0],
                     preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * jnp.broadcast_to(
        alpha[:, :1], acc_scr.shape) + pv

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        l = acc_scr[...][:, D:D + 1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * jnp.broadcast_to(l_inv, acc_scr.shape)
                    ).astype(o_ref.dtype)


def flash_v2a(q, k, v, sm_scale=None, block_q=1024, block_k=1024):
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    q = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    # augment v with a ones column (pads lanes to 128 anyway)
    ones = jnp.ones((B, H, Skv, 1), v.dtype)
    vaug = jnp.concatenate([v, ones], axis=-1)
    Daug = D + 1

    qf = q.reshape(B * H, Sq, D)
    kf = k.reshape(B * H, Skv, D)
    vf = vaug.reshape(B * H, Skv, Daug)
    num_kv = Skv // block_k
    grid = (B * H, Sq // block_q, num_kv)

    out = pl.pallas_call(
        functools.partial(_kernel_v2a, num_kv_tiles=num_kv, D=D),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq, Daug), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, Daug), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Daug), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, Daug), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qf, kf, vf)
    return out[:, :, :D].reshape(B, H, Sq, D)


# --------------------------------------------------------------------------
# v2b: static norm bound instead of running max; no rescale, no m scratch
# --------------------------------------------------------------------------


def _kernel_v2b(kmax_ref, q_ref, k_ref, vaug_ref, o_ref, acc_scr, bnd_scr, *,
                num_kv_tiles: int, D: int, bf16_exp: bool):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)
        qn = jnp.sqrt(jnp.sum(
            q_ref[0].astype(jnp.float32) ** 2, axis=1, keepdims=True))
        bnd_scr[...] = jnp.broadcast_to(qn * kmax_ref[0, 0], bnd_scr.shape)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = s - jnp.broadcast_to(bnd_scr[...][:, :1], s.shape)
    if bf16_exp:
        p = jnp.exp(z.astype(jnp.bfloat16))
    else:
        p = jnp.exp(z)
    pv = jax.lax.dot(p.astype(vaug_ref.dtype), vaug_ref[0],
                     preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] + pv

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        l = acc_scr[...][:, D:D + 1]
        l_inv = jnp.where(l <= 1e-37, 0.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * jnp.broadcast_to(l_inv, acc_scr.shape)
                    ).astype(o_ref.dtype)


def flash_v2b(q, k, v, sm_scale=None, block_q=1024, block_k=1024,
              bf16_exp=False):
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    q = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    kmax = jnp.max(jnp.linalg.norm(k.astype(jnp.float32), axis=-1), axis=-1)
    kmax = jnp.broadcast_to(kmax.reshape(B * H, 1, 1),
                            (B * H, 1, 128)).astype(jnp.float32)
    ones = jnp.ones((B, H, Skv, 1), v.dtype)
    vaug = jnp.concatenate([v, ones], axis=-1)
    Daug = D + 1

    qf = q.reshape(B * H, Sq, D)
    kf = k.reshape(B * H, Skv, D)
    vf = vaug.reshape(B * H, Skv, Daug)
    num_kv = Skv // block_k
    grid = (B * H, Sq // block_q, num_kv)

    out = pl.pallas_call(
        functools.partial(_kernel_v2b, num_kv_tiles=num_kv, D=D,
                          bf16_exp=bf16_exp),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq, Daug), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, Daug), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Daug), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, Daug), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(kmax, qf, kf, vf)
    return out[:, :, :D].reshape(B, H, Sq, D)


def main():
    key = jax.random.key(0)
    H, D = 8, 40
    for M in (5120, 6144):
        # SD-like activations: layer-norm'd features scaled up, plus an
        # outlier row to stress the norm bound
        q = jax.random.normal(key, (2, H, M, D), jnp.bfloat16) * 3.0
        k = jax.random.normal(jax.random.fold_in(key, 1), (2, H, M, D),
                              jnp.bfloat16) * 3.0
        v = jax.random.normal(jax.random.fold_in(key, 2), (2, H, M, D),
                              jnp.bfloat16)
        k = k.at[:, :, 7, :].mul(4.0)   # outlier key

        ref = reference_attention(q, k, v)
        flops = 4 * 2 * H * M * M * D

        for name, f in [
            ("v1 ", lambda kk, q, k, v: flash_attention(
                q * (1 + 1e-9 * jax.random.uniform(kk)), k, v)),
            ("v2a", lambda kk, q, k, v: flash_v2a(
                q * (1 + 1e-9 * jax.random.uniform(kk)), k, v)),
            ("v2b", lambda kk, q, k, v: flash_v2b(
                q * (1 + 1e-9 * jax.random.uniform(kk)), k, v)),
            ("v2c", lambda kk, q, k, v: flash_v2b(
                q * (1 + 1e-9 * jax.random.uniform(kk)), k, v,
                bf16_exp=True)),
        ]:
            try:
                out = f(key, q, k, v)
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
                ms = device_time(f, q, k, v)
                print(f"M={M} {name}: {ms:6.2f}ms ({flops/ms/1e9:6.1f} TF/s)"
                      f"  max|err|={err:.4f}")
            except Exception as e:
                print(f"M={M} {name}: FAILED {type(e).__name__}: {e}"[:240])


if __name__ == "__main__":
    main()
