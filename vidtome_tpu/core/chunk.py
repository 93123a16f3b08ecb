"""Chunk scheduling for the generation sampler.

The reference splits the frame axis into chunks with a random-length first
chunk, optional global reversal, and a per-timestep processing order
('seq' / 'rand' / 'mix-k') to decorrelate the global token bank
(generate.py:172-203 in lixirui142/VidToMe).  Ragged chunks are dynamic
shapes, so the TPU-native redesign keeps every chunk exactly ``chunk_size``
frames and gets the same boundary decorrelation by *cyclically rotating*
the frame axis by a random offset each timestep (plus the same optional
flip and chunk-order permutation).  The video is padded once to a multiple
of ``chunk_size`` (repeating the last frame) with a validity mask.

All of this is host-side numpy: it only produces integer index arrays that
feed the jitted chunk step.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class ChunkSchedule:
    """Frame ordering for one timestep.

    frame_order: [n_padded] — permutation applied to the frame axis
        (rotation + optional flip).  Chunk c covers
        ``frame_order[c*chunk : (c+1)*chunk]``.
    chunk_perm: [n_chunks] — order in which chunks are processed.
    """

    frame_order: np.ndarray
    chunk_perm: np.ndarray
    chunk_size: int

    @property
    def n_chunks(self) -> int:
        return len(self.chunk_perm)

    def chunk_frames(self, c_pos: int) -> np.ndarray:
        """Frame indices of the ``c_pos``-th *processed* chunk."""
        c = int(self.chunk_perm[c_pos])
        return self.frame_order[c * self.chunk_size:(c + 1) * self.chunk_size]


def pad_to_chunks(n_frames: int, chunk_size: int) -> tuple[int, np.ndarray]:
    """Return (padded length, source index per padded frame).  Padding
    repeats the last frame; a frame mask is ``arange(padded) < n_frames``."""
    n_padded = -(-n_frames // chunk_size) * chunk_size
    src = np.minimum(np.arange(n_padded), n_frames - 1)
    return n_padded, src


def _mix_order(n: int, perm_div: float, rng: np.random.Generator) -> np.ndarray:
    """Partial permutation: ~n/perm_div chunks in random order first, the
    rest sequential, oriented to continue near the last random chunk
    (reference generate.py:189-199)."""
    randord = rng.permutation(n).tolist()
    rand_len = int(n / perm_div)
    seqord = sorted(randord[rand_len:])
    if rand_len > 0:
        randord = randord[:rand_len]
        if abs(seqord[-1] - randord[-1]) < abs(seqord[0] - randord[-1]):
            seqord = seqord[::-1]
        return np.array(randord + seqord)
    return np.array(seqord)


def chunk_schedule(
    n_padded: int,
    chunk_size: int,
    rng: np.random.Generator,
    chunk_ord: str = "mix",
    perm_div: float = 3.0,
    merge_global: bool = True,
) -> ChunkSchedule:
    assert n_padded % chunk_size == 0
    n_chunks = n_padded // chunk_size

    offset = int(rng.integers(0, chunk_size))
    order = (np.arange(n_padded) + offset) % n_padded
    if rng.random() > 0.5:
        order = order[::-1].copy()

    if not merge_global or chunk_ord == "seq" or n_chunks == 1:
        perm = np.arange(n_chunks)
    elif chunk_ord == "rand":
        perm = rng.permutation(n_chunks)
    elif chunk_ord == "mix":
        perm = _mix_order(n_chunks, perm_div, rng)
    else:
        raise ValueError(f"unknown chunk_ord: {chunk_ord}")
    return ChunkSchedule(frame_order=order, chunk_perm=perm,
                         chunk_size=chunk_size)


def _chunk_perm(n_chunks: int, chunk_ord: str, perm_div: float,
                merge_global: bool, rng: np.random.Generator) -> np.ndarray:
    if not merge_global or chunk_ord == "seq" or n_chunks == 1:
        return np.arange(n_chunks)
    if chunk_ord == "rand":
        return rng.permutation(n_chunks)
    if chunk_ord == "mix":
        return _mix_order(n_chunks, perm_div, rng)
    raise ValueError(f"unknown chunk_ord: {chunk_ord}")


def fidx_pair(fidx: np.ndarray) -> np.ndarray:
    """[..., cs] frame indices -> [..., cs, 2] (gather, scatter) pairs
    with gather == scatter (the rotate-mode layout)."""
    return np.stack([fidx, fidx], axis=-1)


def ragged_fidx(
    n_frames: int,
    chunk_size: int,
    rng: np.random.Generator,
    chunk_ord: str = "mix",
    perm_div: float = 3.0,
    merge_global: bool = True,
    waste_slot: int | None = None,
) -> np.ndarray:
    """Reference-faithful ragged chunk boundaries under static shapes.

    The reference randomizes the FIRST chunk's length per timestep and
    never wraps around the video end (`generate.py:172-203`); the flip
    reverses the chunk LIST (frames stay forward within chunks).  Static-
    shape encoding: every chunk is ``chunk_size`` slots; a chunk with
    L < chunk_size real frames repeats its last frame into the unused
    slots on the GATHER side (duplicated identical tokens are attention-
    invariant and merge losslessly) and routes those slots' writes to
    ``waste_slot`` on the SCATTER side, so no real frame's eps is ever
    clobbered by a duplicate and padded frames never participate in
    merging or the global bank.

    Returns [K, chunk_size, 2] int32 (gather, scatter) in processing
    order, K = 1 + ceil((n_frames - 1) / chunk_size).  The first-chunk
    length r is drawn uniformly from [1, chunk_size] conditioned on the
    layout producing exactly K chunks (values collapsing a chunk are
    resampled — the one distributional deviation from the reference,
    needed for a single compiled executable).
    """
    cs = chunk_size
    if waste_slot is None:
        waste_slot = n_frames
    K = 1 + int(np.ceil(max(n_frames - 1, 1) / cs))
    while True:
        r = int(rng.integers(0, cs)) + 1
        k_r = 1 + (0 if n_frames <= r else int(np.ceil((n_frames - r) / cs)))
        if k_r == K:
            break
    idx = np.arange(n_frames)
    chunks = [idx[:r]] + [idx[i: i + cs] for i in range(r, n_frames, cs)]
    if rng.random() > 0.5:
        chunks = chunks[::-1]
    perm = _chunk_perm(len(chunks), chunk_ord, perm_div, merge_global, rng)
    chunks = [chunks[int(i)] for i in perm]

    out = np.empty((K, cs, 2), np.int64)
    for c, f in enumerate(chunks):
        pad = cs - len(f)
        out[c, :, 0] = np.concatenate([f, np.full(pad, f[-1])])
        out[c, :, 1] = np.concatenate([f, np.full(pad, waste_slot)])
    return out


def build_fidx_table(
    n_padded: int,
    chunk_size: int,
    rng: np.random.Generator,
    steps: int,
    chunk_ord: str = "mix",
    perm_div: float = 3.0,
    merge_global: bool = True,
    ragged: bool = False,
    n_frames: int | None = None,
) -> np.ndarray:
    """Per-timestep chunk schedules: [steps, K, chunk_size, 2] int32
    (gather, scatter) — rotate mode (default) or reference-faithful
    ragged mode (``ragged=True``; schedules only the ``n_frames`` real
    frames, writes duplicate-slot outputs to the first pad slot)."""
    tables = []
    for _ in range(steps):
        if ragged:
            assert n_frames is not None
            tables.append(ragged_fidx(
                n_frames, chunk_size, rng, chunk_ord=chunk_ord,
                perm_div=perm_div, merge_global=merge_global,
                waste_slot=n_frames))
        else:
            sch = chunk_schedule(n_padded, chunk_size, rng,
                                 chunk_ord=chunk_ord, perm_div=perm_div,
                                 merge_global=merge_global)
            tables.append(fidx_pair(np.stack([
                sch.chunk_frames(pos) for pos in range(sch.n_chunks)])))
    return np.stack(tables).astype(np.int32)


def parse_chunk_ord(chunk_ord: str) -> tuple[str, float]:
    """'mix-4' -> ('mix', 4.0); 'seq'/'rand' pass through
    (reference generate.py:86-89)."""
    if chunk_ord.startswith("mix"):
        div = float(chunk_ord.split("-")[-1]) if "-" in chunk_ord else 3.0
        return "mix", div
    return chunk_ord, 3.0
