"""ToMe (token merging) configuration and per-call state for the UNet.

The reference wires merging into someone else's UNet by class-swapping
transformer blocks and sharing a mutable ``_tome_info`` dict
(``vidtome/patch.py:234-334`` in lixirui142/VidToMe).  We own the UNet, so
merging is a constructor-level feature: :class:`ToMeConfig` is a static
attribute of the model, and the per-call dynamic state (PRNG key, bank mode)
travels explicitly through ``__call__``.  Global token banks live in the
``tome_bank`` flax variable collection so the chunk loop can carry them as a
pytree (reference keeps them as CPU-offloaded module attributes,
``patch.py:80-82``; on TPU they stay in HBM).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ToMeConfig:
    """Static token-merging configuration (reference: patch.py apply_patch args)."""

    frames: int                      # frames per chunk joined for merging
    local_merge_ratio: float = 0.9
    merge_global: bool = False
    global_merge_ratio: float = 0.8
    global_rand: float = 0.5         # P(bank plays src) in global merge
    max_downsample: int = 2          # merge only at downsample <= this
    target_stride: int = 4
    align_batch: bool = False
    merge_mode: str = "replace"
    collect_stats: bool = False      # sow per-block merge stats into the
                                     # 'tome_stats' collection (observability;
                                     # generalizes the reference's
                                     # collect_from_patch, patch.py:373-387)
    share_match: bool = False        # compute the bipartite matching once
                                     # per resolution level per forward and
                                     # reuse the plan in sibling blocks
                                     # (perf option; the reference matches
                                     # per block — documented deviation)
    merge_crossattn: bool = False    # also run cross-attention on the
                                     # locally-merged sequence (the
                                     # reference's LDM-path ToMeBlock wraps
                                     # attn2 too, patch.py:104-114; its
                                     # diffusers path — our default — does
                                     # not).  ~3x fewer attn2 FLOPs at
                                     # merged levels; merged-away tokens
                                     # take their dst's output.
    merge_ff: bool = False           # same for the feed-forward (LDM-path
                                     # ToMeBlock wraps ff, patch.py:113) —
                                     # the biggest FLOP lever after attn1.
    len_quantum: int | None = 1024   # round merged lengths down to this
                                     # multiple (the flash kernel's tile
                                     # size) so long merged sequences carry
                                     # no tile padding or KV mask; bounded
                                     # slight increase of the effective
                                     # merge ratio (core/merge.quantize_r).
                                     # None = exact r = int(S * ratio).

    def merged_local_len(self, tokens_per_frame: int) -> int:
        """Static length of the locally-merged sequence for one chunk."""
        from vidtome_tpu.core.merge import (_round_stride, local_merge_rounds,
                                            quantize_r)

        n = self.frames * tokens_per_frame
        unm = 0
        cur_tokens = n
        for curF in local_merge_rounds(self.frames, self.target_stride):
            stride = _round_stride(curF, self.target_stride)
            n_dst = curF // stride
            tnum = (cur_tokens - unm) // curF
            S = (curF - n_dst) * tnum
            r = min(S, int(S * self.local_merge_ratio))
            r = quantize_r(S, r, n_dst * tnum + unm, self.len_quantum)
            unm_round = S - r
            cur_tokens = unm_round + n_dst * tnum + unm
            unm += unm_round
        return cur_tokens


@dataclasses.dataclass
class ToMeCall:
    """Per-UNet-call dynamic merging state.

    key: shared PRNG key — every transformer block derives the *same* random
         draws from it, mirroring the reference's shared-generator semantics
         (patch.py:215-231).
    bank_mode: 'off' (no global merge this call), 'init' (first chunk of a
         timestep: store local tokens as the new bank), or 'merge' (merge
         against the existing bank and update it).  Static: selects the
         compiled graph variant.
    plan_cache: trace-time cache for ``share_match``: the first block at a
         resolution level stores its merge plans (traced index arrays);
         sibling blocks reuse them.  Plain Python dict mutated during
         tracing — it never crosses a jit boundary (ToMeCall is constructed
         inside the jitted step).
    """

    key: object
    bank_mode: str = "off"
    plan_cache: dict | None = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        assert self.bank_mode in ("off", "init", "merge")
