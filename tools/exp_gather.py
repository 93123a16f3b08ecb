"""Experiment: token gather/scatter strategies on TPU.

The merge/unmerge gathers (take_along_axis over the token axis) measured
~1.6ms at [2,16384,320] — 60x below HBM bandwidth.  Candidates:

  A. take_along_axis (current)
  B. one-hot matmul (rides the MXU, FLOP-wasteful)
  C. Pallas kernel: x resident in VMEM, per-row dynamic reads
  D. Pallas kernel: jnp.take inside the kernel
  E. sorted-index take_along_axis (does monotonicity help XLA?)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_gather.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

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
# Pallas row-gather kernel: out[b, i] = x[b, idx[b, i]]
# x resident in VMEM per batch slice; idx read per row.
# --------------------------------------------------------------------------


def _gather_kernel(idx_ref, x_ref, o_ref, *, rows_per_tile: int):
    b = pl.program_id(0)
    tile = pl.program_id(1)
    base = tile * rows_per_tile

    def body(i, _):
        j = idx_ref[b, base + i]
        o_ref[0, i, :] = x_ref[0, j, :]
        return 0

    jax.lax.fori_loop(0, rows_per_tile, body, 0)


def pallas_gather(x, idx, block_rows=2048):
    B, N, C = x.shape
    M = idx.shape[1]
    Mp = -(-M // block_rows) * block_rows
    idxp = jnp.pad(idx, ((0, 0), (0, Mp - M)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Mp // block_rows),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, i, idx: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, C), lambda b, i, idx: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, rows_per_tile=block_rows),
        out_shape=jax.ShapeDtypeStruct((B, Mp, C), x.dtype),
        grid_spec=grid_spec,
    )(idxp, x)
    return out[:, :M]


def _take_kernel(idx_ref, x_ref, o_ref, *, rows_per_tile: int):
    b = pl.program_id(0)
    tile = pl.program_id(1)
    base = tile * rows_per_tile
    rows = jax.lax.broadcasted_iota(jnp.int32, (rows_per_tile, 1), 0)
    idx_tile = idx_ref[b, pl.ds(base, rows_per_tile)]  # SMEM slice? fallback
    del rows
    o_ref[0] = jnp.take(x_ref[0], idx_tile, axis=0)


def pallas_take(x, idx, block_rows=2048):
    B, N, C = x.shape
    M = idx.shape[1]
    Mp = -(-M // block_rows) * block_rows
    idxp = jnp.pad(idx, ((0, 0), (0, Mp - M)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Mp // block_rows),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, i, idx: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, C), lambda b, i, idx: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_take_kernel, rows_per_tile=block_rows),
        out_shape=jax.ShapeDtypeStruct((B, Mp, C), x.dtype),
        grid_spec=grid_spec,
    )(idxp, x)
    return out[:, :M]


def _gather_dma_kernel(idx_ref, x_hbm, o_ref, sem, *, rows_per_tile: int):
    """Per-row async DMA from HBM, round-robin over a small semaphore set."""
    NSEM = 8
    b = pl.program_id(0)
    tile = pl.program_id(1)
    base = tile * rows_per_tile

    def start(i):
        j = idx_ref[b, base + i]
        pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(j, 1), :],
            o_ref.at[0, pl.ds(i, 1), :],
            sem.at[i % NSEM],
        ).start()

    def wait(i):
        j = idx_ref[b, base + i]
        pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(j, 1), :],
            o_ref.at[0, pl.ds(i, 1), :],
            sem.at[i % NSEM],
        ).wait()

    for w in range(NSEM):
        start(w)

    def body(i, _):
        wait(i)

        @pl.when(i + NSEM < rows_per_tile)
        def _():
            start(i + NSEM)

        return 0

    jax.lax.fori_loop(0, rows_per_tile, body, 0)


def pallas_gather_dma(x, idx, block_rows=2048):
    B, N, C = x.shape
    M = idx.shape[1]
    Mp = -(-M // block_rows) * block_rows
    idxp = jnp.pad(idx, ((0, 0), (0, Mp - M)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Mp // block_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, block_rows, C), lambda b, i, idx: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
    )
    out = pl.pallas_call(
        functools.partial(_gather_dma_kernel, rows_per_tile=block_rows),
        out_shape=jax.ShapeDtypeStruct((B, Mp, C), x.dtype),
        grid_spec=grid_spec,
    )(idxp, x)
    return out[:, :M]


def one_hot_gather(x, idx):
    B, N, C = x.shape
    M = idx.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, M, N), 2)
    oh = (cols == idx[:, :, None]).astype(x.dtype)
    return jnp.einsum("bmn,bnc->bmc", oh, x,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    key = jax.random.key(0)
    for (tag, N, M, C) in [("L0 merge   16k->5.3k", 16384, 5325, 320),
                           ("L0 unmerge 5.3k->16k", 5325, 16384, 320),
                           ("L1 merge    4k->1.3k", 4096, 1331, 640)]:
        x = jax.random.normal(key, (2, N, C), jnp.bfloat16)
        idx = jax.random.randint(key, (2, M), 0, N)
        idx_sorted = jnp.sort(idx, axis=1)

        def f_take(kk, x, idx):
            xx = x * (1 + 1e-9 * jax.random.uniform(kk))
            return jnp.take_along_axis(xx, idx[..., None], axis=1)

        def f_pallas(kk, x, idx):
            xx = x * (1 + 1e-9 * jax.random.uniform(kk))
            return pallas_gather(xx, idx)

        def f_ptake(kk, x, idx):
            xx = x * (1 + 1e-9 * jax.random.uniform(kk))
            return pallas_take(xx, idx)

        def f_onehot(kk, x, idx):
            xx = x * (1 + 1e-9 * jax.random.uniform(kk))
            return one_hot_gather(xx, idx)

        # parity check first
        a = np.asarray(f_take(key, x, idx))
        def f_dma(kk, x, idx):
            xx = x * (1 + 1e-9 * jax.random.uniform(kk))
            return pallas_gather_dma(xx, idx)

        for name, f in [("pallas-rowloop", f_pallas),
                        ("pallas-dma", f_dma), ("one-hot", f_onehot)]:
            try:
                b = np.asarray(f(key, x, idx))
                ok = np.allclose(a, b, atol=1e-2)
            except Exception as e:
                print(f"  {tag} {name}: FAILED ({type(e).__name__}: {e})"[:300])
                continue
            ms = device_time(f, x, idx)
            print(f"  {tag} {name}: {ms:6.3f}ms parity={ok}")
        ms = device_time(f_take, x, idx)
        print(f"  {tag} take_along_axis: {ms:6.3f}ms")
        ms = device_time(f_take, x, idx_sorted)
        print(f"  {tag} take(sorted):    {ms:6.3f}ms")


if __name__ == "__main__":
    main()
