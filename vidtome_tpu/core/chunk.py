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


def parse_chunk_ord(chunk_ord: str) -> tuple[str, float]:
    """'mix-4' -> ('mix', 4.0); 'seq'/'rand' pass through
    (reference generate.py:86-89)."""
    if chunk_ord.startswith("mix"):
        div = float(chunk_ord.split("-")[-1]) if "-" in chunk_ord else 3.0
        return "mix", div
    return chunk_ord, 3.0
