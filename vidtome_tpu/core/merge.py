"""Cross-frame token merging as static-shape gather plans.

This is the TPU-native re-design of the reference's bipartite soft matching
(``vidtome/merge.py:20-159`` local / ``:343-463`` global in
lixirui142/VidToMe).  The reference returns Python closures that gather /
scatter with data-dependent shapes; here every matching produces a
:class:`MergePlan` — a pytree of *statically shaped* index arrays — and
``merge`` / ``unmerge`` are single batched gathers.  All shapes are fixed by
``(num_tokens, num_frames, ratio, target_stride)`` at trace time, so the
whole thing compiles once under ``jit`` and the per-step work is
MXU-friendly: one cosine-similarity matmul, one top-r argsort, and two
gathers.

Token layout convention (identical to the reference): a "joined" sequence is
``[unm_pre prefix | frame_0 | frame_1 | ...]`` of length
``N = unm_pre + F * tnum``.  A merge keeps ``[new_unmerged | dst]`` where
``dst = [dst frames | previous unm_pre prefix]``.

Deviation from the reference (documented): when ``target_stride`` does not
divide the current frame count, the reference's dst-frame count would depend
on the random draw (a dynamic shape).  We instead use the largest divisor of
``F`` that is <= ``target_stride``, which preserves the one-dst-frame-per-
stride-window structure with a static count.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class MergePlan(NamedTuple):
    """Static-shape record of one bipartite matching.

    With ``S`` src tokens, ``D`` dst tokens, ``r`` merged and ``U = S - r``
    unmerged, over batch ``B`` and full sequence length ``N = S + D``:

      merge_gather:   [B, U + D] — ``merged[i] = x[merge_gather[i]]``
                      (replace mode: unmerged src tokens then dst tokens).
      unmerge_gather: [B, N] — ``restored[n] = merged[unmerge_gather[n]]``;
                      merged src tokens read back their matched dst token.
      a_idx, b_idx:   [B, S] / [B, D] src / dst token positions in x.
      src_idx:        [B, r] positions *within a_idx order* of merged tokens
                      (None on the fast path — only materialized when
                      ``keep_sorted_indices`` is requested; needed for mean
                      mode and introspection, not for replace merging).
      dst_idx:        [B, r] matched dst (position within b_idx order), or
                      None as above.
      unm_idx:        [B, U] positions within a_idx order of kept tokens.
    """

    merge_gather: jnp.ndarray
    unmerge_gather: jnp.ndarray
    a_idx: jnp.ndarray
    b_idx: jnp.ndarray
    src_idx: jnp.ndarray | None
    dst_idx: jnp.ndarray | None
    unm_idx: jnp.ndarray
    # Structured-dst metadata (set by the matchers whose dst set is made of
    # contiguous token runs — the production local/global matchers).  When
    # present, replace-mode ``merge`` gathers only the (small) kept-src set
    # by row and reads each dst run with a dynamic slice: random row access
    # on TPU costs ~300ns/row regardless of formulation (measured:
    # take_along_axis == Pallas row-loop == one-hot matmul), so shrinking
    # the gathered row count IS the optimization.
    dst_starts: jnp.ndarray | None = None   # [n_runs] run start positions
    dst_run_len: int | None = None          # static tokens per run
    dst_prefix: int | None = None           # static trailing prefix length

    @property
    def unm_num(self) -> int:
        return self.unm_idx.shape[-1]

    @property
    def merged_len(self) -> int:
        return self.merge_gather.shape[-1]

    @property
    def seq_len(self) -> int:
        return self.unmerge_gather.shape[-1]


def _take(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather along the token axis: x [B, N, C], idx [B, K] -> [B, K, C]."""
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def _best_match(src_m, dst_m, use_fused: bool | None):
    from vidtome_tpu.ops import matching

    # Default: XLA path — measured on v5e, XLA fuses the max/argmax
    # reduction into the score matmul and beats the hand-written Pallas
    # kernel (1.55ms vs 2.33ms at [2,12288,320]x[2,4096,320]); the kernel
    # remains available for shapes where XLA's fusion fails.
    if use_fused:
        return matching.best_match(src_m, dst_m)
    return matching.best_match_reference(src_m, dst_m)


def _build_plan(
    metric: jnp.ndarray,
    a_idx: jnp.ndarray,
    b_idx: jnp.ndarray,
    r: int,
    align_batch: bool,
    keep_sorted_indices: bool = False,
    use_fused: bool | None = None,
) -> MergePlan:
    """Shared matching core: cosine-sim src->dst, greedy top-r by best-match
    score (reference: merge.py:83-117), then bake gather maps.

    The hot path never materializes the [S, D] score matrix (fused Pallas
    matmul+argmax on TPU) nor a full argsort: replace-mode merging only
    needs the bottom-(S-r) "unmerged" set (top_k) and every src token's best
    dst (argmax).  ``keep_sorted_indices=True`` additionally materializes
    the score-ordered src/dst index lists (mean mode, tests).

    ``a_idx``/``b_idx``: [B, S] / [B, D] token positions (already batched).
    """
    B, N, _ = metric.shape
    S, D = a_idx.shape[-1], b_idx.shape[-1]
    U = S - r

    # Cosine similarity on normalized metric; matmul rides the MXU in bf16
    # with fp32 accumulation.
    mnorm = metric / jnp.clip(
        jnp.linalg.norm(metric.astype(jnp.float32), axis=-1, keepdims=True), 1e-6
    )
    src_m = _take(mnorm, a_idx).astype(jnp.bfloat16)
    dst_m = _take(mnorm, b_idx).astype(jnp.bfloat16)
    node_max, node_idx = _best_match(src_m, dst_m, use_fused)  # [B, S] each

    if align_batch:
        # One matching shared by every batch lane (needed for PnP: the
        # source / uncond / cond lanes must merge coherently,
        # reference: merge.py:93-108): greedy over all lanes' scores =
        # take each src token's best lane.
        lane = jnp.argmax(node_max, axis=0)  # [S]
        node_max = jnp.max(node_max, axis=0, keepdims=True)  # [1, S]
        node_idx = jnp.take_along_axis(node_idx, lane[None], axis=0)  # [1, S]

    src_idx = dst_idx = None
    if keep_sorted_indices:
        order = jnp.argsort(-node_max, axis=-1).astype(jnp.int32)
        src_idx = order[:, :r]
        unm_idx = order[:, r:]
        dst_idx = jnp.take_along_axis(node_idx, src_idx, axis=1)
    else:
        _, unm_idx = jax.lax.top_k(-node_max, U)
        unm_idx = unm_idx.astype(jnp.int32)

    if align_batch:
        unm_idx = jnp.broadcast_to(unm_idx, (B, U))
        node_idx = jnp.broadcast_to(node_idx, (B, S))
        if keep_sorted_indices:
            src_idx = jnp.broadcast_to(src_idx, (B, r))
            dst_idx = jnp.broadcast_to(dst_idx, (B, r))

    # merged = [ src[unm_idx] | dst ]  — a single gather from x.
    merge_gather = jnp.concatenate(
        [jnp.take_along_axis(a_idx, unm_idx, axis=1), b_idx], axis=1
    )

    # Inverse map: every original position reads one merged position.
    #   b_idx[j]          <- U + j
    #   a_idx[k]          <- U + node_idx[k]   (all src: their best dst)
    #   a_idx[unm_idx[i]] <- i                 (overwrites the kept subset)
    barange = jnp.arange(B, dtype=jnp.int32)[:, None]
    inv = jnp.zeros((B, N), dtype=jnp.int32)
    inv = inv.at[barange, b_idx].set(U + jnp.arange(D, dtype=jnp.int32)[None, :])
    inv = inv.at[barange, a_idx].set(U + node_idx)
    inv = inv.at[barange, jnp.take_along_axis(a_idx, unm_idx, axis=1)].set(
        jnp.arange(U, dtype=jnp.int32)[None, :]
    )

    return MergePlan(
        merge_gather=merge_gather,
        unmerge_gather=inv,
        a_idx=a_idx,
        b_idx=b_idx,
        src_idx=src_idx,
        dst_idx=dst_idx,
        unm_idx=unm_idx,
    )


def merge(x: jnp.ndarray, plan: MergePlan, mode: str = "replace") -> jnp.ndarray:
    """Apply a merge plan: [B, N, C] -> [B, U + D, C].

    ``replace`` (the reference default) is one gather — or, when the plan
    carries structured-dst metadata, a small kept-row gather plus
    contiguous dynamic slices for the dst runs (far cheaper: row-gather
    bandwidth on TPU is ~60x below sequential DMA).  ``mean`` additionally
    averages each dst token with all src tokens assigned to it
    (reference: merge.py:127-131, scatter_reduce 'mean' include_self)."""
    # Structured path only when the run metadata is still static Python
    # ints: a plan that crossed a jit boundary has traced metadata (jit
    # flattens NamedTuple leaves) — fall back to the single gather then.
    if mode == "replace" and isinstance(plan.dst_run_len, int):
        U = plan.unm_num
        parts = [_take(x, plan.merge_gather[:, :U])]
        for i in range(plan.dst_starts.shape[0]):
            parts.append(jax.lax.dynamic_slice_in_dim(
                x, plan.dst_starts[i], plan.dst_run_len, axis=1))
        if plan.dst_prefix:
            parts.append(x[:, : plan.dst_prefix])
        return jnp.concatenate(parts, axis=1)
    out = _take(x, plan.merge_gather)
    if mode == "replace":
        return out
    if mode == "mean":
        assert plan.src_idx is not None, (
            "mean-mode merging needs sorted indices: build the plan with "
            "keep_sorted_indices=True")
        B = x.shape[0]
        U = plan.unm_num
        barange = jnp.arange(B, dtype=jnp.int32)[:, None]
        src_vals = _take(x, jnp.take_along_axis(plan.a_idx, plan.src_idx, axis=1))
        acc = out.at[barange, U + plan.dst_idx].add(src_vals)
        counts = jnp.ones(out.shape[:2], x.dtype).at[
            barange, U + plan.dst_idx
        ].add(1.0)
        return acc / counts[..., None]
    raise ValueError(f"unknown merge mode: {mode}")


def unmerge(y: jnp.ndarray, plan: MergePlan) -> jnp.ndarray:
    """Invert a merge: [B, U + D, C] -> [B, N, C] (one gather; merged src
    positions read their matched dst token, reference: merge.py:135-155)."""
    return _take(y, plan.unmerge_gather)


# ---------------------------------------------------------------------------
# Local (intra-chunk, cross-frame) matching — reference merge.py:20-159.
# ---------------------------------------------------------------------------


def quantize_r(S: int, r: int, D: int, quantum: int | None,
               min_len: int = 1024) -> int:
    """Round the merge count ``r`` UP so the merged length ``(S - r) + D``
    lands on a multiple of the attention kernel's tile size.

    At 512p this turns e.g. 5325 merged tokens into 5120: the flash kernel
    runs 25 instead of 36 tile pairs and needs no KV padding mask — a pure
    win bought with a slightly higher effective merge ratio (0.9 ->
    0.9167), bounded by never dropping more than half the unmerged set and
    never quantizing short sequences (< min_len, where tile padding is
    cheap relative to semantic loss).  Below 4x the quantum the effective
    quantum shrinks to quantum/4 (>=256): mid-resolution merged lengths
    (e.g. 1332 at L1) land on a 256-multiple so the kernel picks a smaller
    mask-free block instead of padding 1332 -> 2048 with a mask.  ``None``
    disables (exact reference semantics: r = int(S * ratio))."""
    if not quantum:
        return r
    U = S - r
    M = U + D
    if M < min_len:
        return r
    q = quantum if M >= 4 * quantum else max(quantum // 4, 256)
    slack = M % q
    if slack == 0 or U - slack < 0 or (U - slack) * 2 < U:
        return r
    return r + slack


def _largest_divisor_leq(n: int, k: int) -> int:
    for d in range(min(n, k), 0, -1):
        if n % d == 0:
            return d
    return 1


def _round_stride(F: int, target_stride: int) -> int:
    """Effective dst stride for a round: the largest divisor of F that is
    <= target_stride (so the dst-frame count is static), falling back to F
    itself (a single dst frame) when no divisor >= 2 fits."""
    s = _largest_divisor_leq(F, min(max(1, target_stride), F))
    return s if s >= 2 else F


def local_matching(
    metric: jnp.ndarray,
    F: int,
    ratio: float,
    unm_pre: int,
    key: jax.Array,
    target_stride: int = 4,
    align_batch: bool = False,
    keep_sorted_indices: bool = False,
    use_fused: bool | None = None,
    len_quantum: int | None = None,
) -> MergePlan | None:
    """One round of random-dst-frame bipartite matching over joined frames.

    ``metric``: [B, N, C] with N = unm_pre + F * tnum.  One frame in every
    ``stride`` consecutive frames (chosen by ``key``) becomes dst; all other
    frames are src; the previous unmerged prefix joins dst.  Returns None for
    a degenerate config (ratio <= 0 or F < 2).  ``len_quantum``: round the
    merged length down to this multiple (see :func:`quantize_r`).
    """
    B, N, _ = metric.shape
    if ratio <= 0 or F < 2:
        return None
    tnum = (N - unm_pre) // F
    stride = _round_stride(F, target_stride)
    n_dst_frames = F // stride

    randf = jax.random.randint(key, (), 0, stride)
    frames = jnp.arange(F, dtype=jnp.int32)
    is_dst = (frames % stride) == randf
    # Stable sort: src frames (in order) first, dst frames last.
    perm = jnp.argsort(is_dst, stable=True).astype(jnp.int32)
    src_frames = perm[: F - n_dst_frames]
    dst_frames = perm[F - n_dst_frames:]

    tok = jnp.arange(tnum, dtype=jnp.int32)
    a_idx = (unm_pre + src_frames[:, None] * tnum + tok[None, :]).reshape(-1)
    b_frame_idx = (unm_pre + dst_frames[:, None] * tnum + tok[None, :]).reshape(-1)
    b_idx = jnp.concatenate([b_frame_idx, jnp.arange(unm_pre, dtype=jnp.int32)])

    S = (F - n_dst_frames) * tnum
    r = min(S, int(S * ratio))
    r = quantize_r(S, r, b_idx.shape[0], len_quantum)
    plan = _build_plan(
        metric,
        jnp.broadcast_to(a_idx, (B, S)),
        jnp.broadcast_to(b_idx, (B, b_idx.shape[0])),
        r,
        align_batch,
        keep_sorted_indices=keep_sorted_indices,
        use_fused=use_fused,
    )
    # dst = whole frames (+ the prefix): contiguous runs, shared across the
    # batch — record them so replace-mode merge can slice instead of gather.
    return plan._replace(
        dst_starts=unm_pre + dst_frames.astype(jnp.int32) * tnum,
        dst_run_len=tnum, dst_prefix=unm_pre)


def local_merge_rounds(F: int, target_stride: int) -> list[int]:
    """Static round structure: frame counts at the start of each matching
    round (reference: patch.py:44-54 recursive while curF > 1)."""
    rounds = []
    curF = F
    while curF > 1:
        rounds.append(curF)
        curF = curF // _round_stride(curF, target_stride)
    return rounds


def compute_local_merge(
    tokens: jnp.ndarray,
    F: int,
    ratio: float,
    key: jax.Array,
    target_stride: int = 4,
    align_batch: bool = False,
    mode: str = "replace",
    len_quantum: int | None = None,
) -> tuple[jnp.ndarray, list[MergePlan]]:
    """Recursively merge F joined frames down to one set
    (reference: patch.py:44-56).  Returns (merged_tokens, plans); undo with
    :func:`unmerge_all`."""
    plans: list[MergePlan] = []
    unm = 0
    keep_sorted = mode != "replace"
    for curF in local_merge_rounds(F, target_stride):
        key, sub = jax.random.split(key)
        plan = local_matching(
            tokens, curF, ratio, unm, sub,
            target_stride=target_stride, align_batch=align_batch,
            keep_sorted_indices=keep_sorted, len_quantum=len_quantum,
        )
        if plan is None:
            break
        tokens = merge(tokens, plan, mode)
        unm += plan.unm_num
        plans.append(plan)
    return tokens, plans


def unmerge_all(y: jnp.ndarray, plans: Sequence[MergePlan]) -> jnp.ndarray:
    for plan in reversed(plans):
        y = unmerge(y, plan)
    return y


# ---------------------------------------------------------------------------
# Global (inter-chunk, vs token bank) matching — reference merge.py:343-463.
# ---------------------------------------------------------------------------


def two_set_matching(
    metric: jnp.ndarray,
    src_len: int,
    ratio: float,
    align_batch: bool = False,
    keep_sorted_indices: bool = False,
    use_fused: bool | None = None,
    len_quantum: int | None = None,
) -> MergePlan | None:
    """Match the first ``src_len`` tokens (src) against the rest (dst).

    Used for global token merging: ``metric = concat([A, B], axis=1)`` where
    the coin flip upstream decided whether the chunk-local tokens or the
    global bank plays src.  Unmerge restores the full concatenated sequence;
    slice the partition you need with :func:`partition`."""
    B, N, _ = metric.shape
    if ratio <= 0:
        return None
    S = src_len
    D = N - src_len
    r = min(S, int(S * ratio))
    r = quantize_r(S, r, D, len_quantum)
    a_idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    b_idx = jnp.broadcast_to(S + jnp.arange(D, dtype=jnp.int32), (B, D))
    plan = _build_plan(metric, a_idx, b_idx, r, align_batch,
                       keep_sorted_indices=keep_sorted_indices,
                       use_fused=use_fused)
    # dst = the whole second partition: one contiguous run.
    return plan._replace(dst_starts=jnp.asarray([S], jnp.int32),
                         dst_run_len=D, dst_prefix=0)


def partition(x_full: jnp.ndarray, src_len: int, chunk: jnp.ndarray | int) -> jnp.ndarray:
    """Select partition 0 ([:src_len]) or 1 ([src_len:]) of an unmerged
    two-set sequence; ``chunk`` may be traced (both partitions must have the
    same length for a traced selector)."""
    if isinstance(chunk, int):
        return x_full[:, :src_len] if chunk == 0 else x_full[:, src_len:]
    total = x_full.shape[1]
    assert total == 2 * src_len, (
        "traced partition selection requires equal-size partitions")
    start = jnp.where(chunk == 0, 0, src_len)
    return jax.lax.dynamic_slice_in_dim(x_full, start, src_len, axis=1)


# ---------------------------------------------------------------------------
# Original ToMeSD spatial matching — reference merge.py:467-579
# (bipartite_soft_matching_random2d; kept in the reference for image-mode
# token merging, unused by the video pipeline).
# ---------------------------------------------------------------------------


def spatial_matching_2d(
    metric: jnp.ndarray,
    w: int,
    h: int,
    sx: int,
    sy: int,
    r: int,
    key: jax.Array | None = None,
    no_rand: bool = False,
    keep_sorted_indices: bool = False,
) -> MergePlan | None:
    """Single-image ToMeSD matching: one random dst token per (sy, sx)
    spatial window, the rest src; merge the top-r most-similar src tokens.

    ``metric``: [B, h*w, C] tokens in row-major spatial order.  Requires
    sy | h and sx | w (the reference pads the ragged edge; we keep the
    static-friendly exact-division case, which all SD resolutions satisfy).
    """
    B, N, _ = metric.shape
    assert N == h * w and h % sy == 0 and w % sx == 0
    if r <= 0:
        return None
    hsy, wsx = h // sy, w // sx
    num_dst = hsy * wsx

    if no_rand or key is None:
        rand = jnp.zeros((hsy, wsx), jnp.int32)
    else:
        rand = jax.random.randint(key, (hsy, wsx), 0, sy * sx)

    # dst position inside each window -> absolute token index
    wy, wx = jnp.meshgrid(jnp.arange(hsy), jnp.arange(wsx), indexing="ij")
    iy = wy * sy + rand // sx
    ix = wx * sx + rand % sx
    b_idx = (iy * w + ix).reshape(-1).astype(jnp.int32)  # [num_dst]

    # src = everything else, via stable sort of the dst mask
    is_dst = jnp.zeros((N,), jnp.int32).at[b_idx].set(1)
    order = jnp.argsort(is_dst, stable=True).astype(jnp.int32)
    a_idx = order[: N - num_dst]

    r = min(r, N - num_dst)
    return _build_plan(
        metric,
        jnp.broadcast_to(a_idx, (B, N - num_dst)),
        jnp.broadcast_to(b_idx, (B, num_dst)),
        r,
        align_batch=False,
        keep_sorted_indices=keep_sorted_indices,
    )


# ---------------------------------------------------------------------------
# Frame join/split (reference vidtome/utils.py:32-41).
# ---------------------------------------------------------------------------


def join_frames(x: jnp.ndarray, F: int) -> jnp.ndarray:
    """(B*F, N, C) -> (B, F*N, C)."""
    BF, N, C = x.shape
    return x.reshape(BF // F, F * N, C)


def split_frames(x: jnp.ndarray, F: int) -> jnp.ndarray:
    """(B, F*N, C) -> (B*F, N, C)."""
    B, FN, C = x.shape
    return x.reshape(B * F, FN // F, C)
