"""Unit tests for the static-shape token-merge engine.

Invariants mirrored from the reference semantics
(lixirui142/VidToMe vidtome/merge.py):
  * replace-mode merge keeps dst and unmerged-src tokens bit-exact;
  * unmerge restores dst / unmerged tokens exactly and maps every merged src
    position to its matched dst token's value;
  * merged src tokens were matched to their *most similar* dst token;
  * align_batch shares one matching across all batch lanes;
  * the recursive local merge reduces F frames to the documented token count
    (patch.py:252-254: chunk 4, ratio 1.0 -> 0.25x tokens).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidtome_tpu.core import merge as M


def _rand_tokens(key, B, N, C):
    return jax.random.normal(key, (B, N, C), dtype=jnp.float32)


class TestLocalMatching:
    def test_shapes_static(self):
        key = jax.random.key(0)
        B, F, tnum, C = 2, 4, 16, 8
        x = _rand_tokens(key, B, F * tnum, C)
        plan = M.local_matching(x, F=F, ratio=0.9, unm_pre=0,
                                key=jax.random.key(1), target_stride=4,
                                keep_sorted_indices=True)
        S = 3 * tnum
        r = int(S * 0.9)
        assert plan.a_idx.shape == (B, S)
        assert plan.b_idx.shape == (B, tnum)
        assert plan.src_idx.shape == (B, r)
        assert plan.unm_idx.shape == (B, S - r)
        # fast path: no sorted index lists, same static shapes otherwise
        fast = M.local_matching(x, F=F, ratio=0.9, unm_pre=0,
                                key=jax.random.key(1), target_stride=4)
        assert fast.src_idx is None and fast.dst_idx is None
        assert fast.unm_idx.shape == (B, S - r)
        assert fast.merged_len == plan.merged_len
        assert plan.merged_len == (S - r) + tnum
        assert plan.seq_len == F * tnum

    def test_merge_unmerge_roundtrip_replace(self):
        B, F, tnum, C = 2, 4, 16, 8
        x = _rand_tokens(jax.random.key(0), B, F * tnum, C)
        plan = M.local_matching(x, F=F, ratio=0.5, unm_pre=0,
                                key=jax.random.key(1),
                                keep_sorted_indices=True)
        y = M.merge(x, plan)
        restored = M.unmerge(y, plan)

        xn, rn = np.asarray(x), np.asarray(restored)
        a, b = np.asarray(plan.a_idx), np.asarray(plan.b_idx)
        unm, src, dst = (np.asarray(plan.unm_idx), np.asarray(plan.src_idx),
                         np.asarray(plan.dst_idx))
        for bi in range(B):
            # dst tokens exact
            np.testing.assert_array_equal(rn[bi, b[bi]], xn[bi, b[bi]])
            # unmerged src tokens exact
            keep = a[bi, unm[bi]]
            np.testing.assert_array_equal(rn[bi, keep], xn[bi, keep])
            # merged src tokens take their matched dst value
            merged_pos = a[bi, src[bi]]
            matched_dst = b[bi, dst[bi]]
            np.testing.assert_array_equal(rn[bi, merged_pos], xn[bi, matched_dst])

    def test_matching_is_greedy_best_dst(self):
        """Each merged src token's assigned dst is its argmax-similarity dst."""
        B, F, tnum, C = 1, 2, 32, 16
        x = _rand_tokens(jax.random.key(3), B, F * tnum, C)
        plan = M.local_matching(x, F=F, ratio=0.5, unm_pre=0,
                                key=jax.random.key(4), target_stride=2,
                                keep_sorted_indices=True)
        xn = np.asarray(x)
        norm = xn / np.linalg.norm(xn, axis=-1, keepdims=True)
        a, b = np.asarray(plan.a_idx)[0], np.asarray(plan.b_idx)[0]
        scores = norm[0, a] @ norm[0, b].T
        expected_best = scores.argmax(-1)
        src, dst = np.asarray(plan.src_idx)[0], np.asarray(plan.dst_idx)[0]
        np.testing.assert_array_equal(dst, expected_best[src])
        # and the merged set is the top-r by best score
        best = scores.max(-1)
        r = len(src)
        top_r = set(np.argsort(-best)[:r].tolist())
        assert set(src.tolist()) == top_r

    def test_align_batch_shares_matching(self):
        B, F, tnum, C = 3, 4, 8, 8
        x = _rand_tokens(jax.random.key(5), B, F * tnum, C)
        plan = M.local_matching(x, F=F, ratio=0.75, unm_pre=0,
                                key=jax.random.key(6), align_batch=True,
                                keep_sorted_indices=True)
        for field in (plan.src_idx, plan.dst_idx, plan.unm_idx):
            fn = np.asarray(field)
            for bi in range(1, B):
                np.testing.assert_array_equal(fn[bi], fn[0])

    def test_unm_pre_prefix_joins_dst(self):
        """Tokens [0, unm_pre) must appear in the dst set and survive merging."""
        B, F, tnum, C, unm_pre = 1, 2, 8, 4, 5
        x = _rand_tokens(jax.random.key(7), B, unm_pre + F * tnum, C)
        plan = M.local_matching(x, F=F, ratio=1.0, unm_pre=unm_pre,
                                key=jax.random.key(8), target_stride=2)
        b = np.asarray(plan.b_idx)[0]
        assert set(range(unm_pre)).issubset(set(b.tolist()))
        y = M.merge(x, plan)
        restored = M.unmerge(y, plan)
        np.testing.assert_array_equal(
            np.asarray(restored)[0, :unm_pre], np.asarray(x)[0, :unm_pre])

    def test_mean_mode(self):
        """Mean mode averages each dst with its assigned src tokens."""
        B, F, tnum, C = 1, 2, 4, 4
        x = _rand_tokens(jax.random.key(9), B, F * tnum, C)
        plan = M.local_matching(x, F=F, ratio=1.0, unm_pre=0,
                                key=jax.random.key(10), target_stride=2,
                                keep_sorted_indices=True)
        y = np.asarray(M.merge(x, plan, mode="mean"))
        xn = np.asarray(x)
        a, b = np.asarray(plan.a_idx)[0], np.asarray(plan.b_idx)[0]
        src, dst = np.asarray(plan.src_idx)[0], np.asarray(plan.dst_idx)[0]
        U = plan.unm_num
        for j in range(len(b)):
            vals = [xn[0, b[j]]] + [xn[0, a[s]] for s, d in zip(src, dst) if d == j]
            np.testing.assert_allclose(y[0, U + j], np.mean(vals, axis=0),
                                       rtol=1e-5, atol=1e-5)


class TestFastPathEquivalence:
    def test_fast_and_sorted_paths_agree_after_unmerge(self):
        """The fast (top_k) path orders the unmerged section differently
        from the argsort path, but selects the same token sets — so
        unmerge(merge(x)) must be identical."""
        B, F, tnum, C = 2, 4, 16, 8
        x = _rand_tokens(jax.random.key(30), B, F * tnum, C)
        fast = M.local_matching(x, F=F, ratio=0.6, unm_pre=0,
                                key=jax.random.key(31))
        slow = M.local_matching(x, F=F, ratio=0.6, unm_pre=0,
                                key=jax.random.key(31),
                                keep_sorted_indices=True)
        # same unmerged token set
        for bi in range(B):
            assert (set(np.asarray(fast.unm_idx)[bi].tolist())
                    == set(np.asarray(slow.unm_idx)[bi].tolist()))
        out_fast = M.unmerge(M.merge(x, fast), fast)
        out_slow = M.unmerge(M.merge(x, slow), slow)
        np.testing.assert_allclose(np.asarray(out_fast),
                                   np.asarray(out_slow), rtol=1e-6, atol=1e-6)

    def test_fused_matching_kernel_matches_reference(self):
        from vidtome_tpu.ops.matching import (best_match,
                                              best_match_reference)

        src = jax.random.normal(jax.random.key(32), (2, 300, 64),
                                jnp.bfloat16)
        dst = jax.random.normal(jax.random.key(33), (2, 200, 64),
                                jnp.bfloat16)
        mx_ref, ix_ref = best_match_reference(src, dst)
        mx, ix = best_match(src, dst, block_s=128, block_d=128,
                            interpret=True)
        np.testing.assert_allclose(np.asarray(mx), np.asarray(mx_ref),
                                   rtol=2e-2, atol=2e-2)
        # argmax may differ on near-ties; indices must agree almost always
        agree = (np.asarray(ix) == np.asarray(ix_ref)).mean()
        assert agree > 0.98


class TestRecursiveLocalMerge:
    @pytest.mark.parametrize("F,stride,expected_rounds", [
        (4, 4, [4]), (8, 4, [8, 2]), (2, 4, [2]), (16, 4, [16, 4]),
        (6, 4, [6, 2]), (5, 4, [5]), (1, 4, []),
    ])
    def test_round_structure(self, F, stride, expected_rounds):
        assert M.local_merge_rounds(F, stride) == expected_rounds

    def test_compression_ratio_chunk4(self):
        """chunk 4, ratio 1.0 -> exactly tnum tokens left (0.25x); ratio 0.9
        -> 0.325x (reference docstring patch.py:252-254)."""
        B, F, tnum, C = 2, 4, 64, 16
        x = _rand_tokens(jax.random.key(11), B, F * tnum, C)
        merged, plans = M.compute_local_merge(
            x, F=F, ratio=1.0, key=jax.random.key(12), target_stride=4)
        assert merged.shape == (B, tnum, C)
        merged9, _ = M.compute_local_merge(
            x, F=F, ratio=0.9, key=jax.random.key(12), target_stride=4)
        expected = (3 * tnum - int(3 * tnum * 0.9)) + tnum  # unm + dst
        assert merged9.shape[1] == expected
        assert abs(expected / (F * tnum) - 0.325) < 0.01

    def test_roundtrip_multi_round(self):
        """8 frames with stride 4 -> two rounds; unmerge_all restores dst
        tokens of the final round exactly."""
        B, F, tnum, C = 2, 8, 16, 8
        x = _rand_tokens(jax.random.key(13), B, F * tnum, C)
        merged, plans = M.compute_local_merge(
            x, F=F, ratio=0.9, key=jax.random.key(14), target_stride=4)
        assert len(plans) == 2
        restored = M.unmerge_all(merged, plans)
        assert restored.shape == x.shape
        # every restored token must equal SOME surviving token value (the
        # whole point of replace-mode merging): check a sample.
        merged_np = np.asarray(merged)
        rn = np.asarray(restored)
        pool = merged_np[0].reshape(-1, C)
        for n in range(0, F * tnum, 37):
            diffs = np.abs(pool - rn[0, n]).sum(-1)
            assert diffs.min() < 1e-5

    def test_jit_and_identical_under_same_key(self):
        B, F, tnum, C = 2, 4, 16, 8
        x = _rand_tokens(jax.random.key(15), B, F * tnum, C)

        def run(x, key):
            merged, plans = M.compute_local_merge(x, F=F, ratio=0.9, key=key)
            return M.unmerge_all(merged, plans)

        jitted = jax.jit(run)
        out1 = jitted(x, jax.random.key(16))
        out2 = run(x, jax.random.key(16))
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-5, atol=1e-6)


class TestGlobalMatching:
    def test_two_set_roundtrip(self):
        B, L, C = 2, 32, 8
        local = _rand_tokens(jax.random.key(17), B, L, C)
        bank = _rand_tokens(jax.random.key(18), B, L, C)
        tokens = jnp.concatenate([local, bank], axis=1)
        plan = M.two_set_matching(tokens, src_len=L, ratio=0.8)
        assert plan.merged_len == (L - int(L * 0.8)) + L
        y = M.merge(tokens, plan)
        full = M.unmerge(y, plan)
        # dst partition (the bank) restored exactly
        np.testing.assert_array_equal(np.asarray(full)[:, L:], np.asarray(bank))
        # partition selection, static and traced
        np.testing.assert_array_equal(
            np.asarray(M.partition(full, L, 0)), np.asarray(full)[:, :L])
        np.testing.assert_array_equal(
            np.asarray(M.partition(full, L, jnp.asarray(1))),
            np.asarray(full)[:, L:])

    def test_traced_partition_selector_jit(self):
        B, L, C = 1, 16, 4
        x = _rand_tokens(jax.random.key(19), B, 2 * L, C)

        @jax.jit
        def pick(x, c):
            return M.partition(x, L, c)

        np.testing.assert_array_equal(np.asarray(pick(x, jnp.asarray(0))),
                                      np.asarray(x)[:, :L])
        np.testing.assert_array_equal(np.asarray(pick(x, jnp.asarray(1))),
                                      np.asarray(x)[:, L:])


class TestSpatial2D:
    def test_one_dst_per_window(self):
        h = w = 8
        x = _rand_tokens(jax.random.key(40), 1, h * w, 16)
        plan = M.spatial_matching_2d(x, w=w, h=h, sx=2, sy=2, r=20,
                                     key=jax.random.key(41))
        b = np.asarray(plan.b_idx)[0]
        assert len(b) == 16  # (8/2)*(8/2) windows
        # exactly one dst inside every 2x2 window
        for wy in range(4):
            for wx in range(4):
                cnt = 0
                for dy in range(2):
                    for dx in range(2):
                        tok = (wy * 2 + dy) * w + (wx * 2 + dx)
                        cnt += tok in b
                assert cnt == 1
        # roundtrip keeps dst tokens exact
        y = M.merge(x, plan)
        assert y.shape[1] == (h * w - 16 - 20) + 16
        restored = M.unmerge(y, plan)
        np.testing.assert_array_equal(np.asarray(restored)[0, b],
                                      np.asarray(x)[0, b])

    def test_no_rand_uses_window_corner(self):
        h = w = 4
        x = _rand_tokens(jax.random.key(42), 1, h * w, 8)
        plan = M.spatial_matching_2d(x, w=w, h=h, sx=2, sy=2, r=4,
                                     no_rand=True)
        np.testing.assert_array_equal(
            sorted(np.asarray(plan.b_idx)[0].tolist()), [0, 2, 8, 10])


class TestFrameOps:
    def test_join_split_inverse(self):
        x = _rand_tokens(jax.random.key(20), 6, 16, 4)  # B*F = 6 with F=3
        joined = M.join_frames(x, 3)
        assert joined.shape == (2, 48, 4)
        back = M.split_frames(joined, 3)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


class TestShareMatchValidity:
    """Validation behind the share_match default (one matching per
    resolution level reused by sibling blocks): transformer blocks update
    hidden states through residual adds, so consecutive blocks' norm1
    outputs are highly correlated and their bipartite matchings agree on
    the vast majority of token pairs.  This test quantifies that: perturb
    video-like tokens at the relative magnitude of one block's residual
    update (~10-30%) and require the merge plans to stay substantially
    aligned."""

    def test_matching_stable_under_sibling_scale_perturbation(self):
        key = jax.random.key(11)
        F, tnum, C = 4, 128, 32
        base = jax.random.normal(key, (1, tnum, C))
        jitter = 0.05 * jax.random.normal(jax.random.fold_in(key, 1),
                                          (F, tnum, C))
        x = (jnp.broadcast_to(base, (F, tnum, C)) + jitter).reshape(
            1, F * tnum, C)

        match_key = jax.random.key(5)
        plan_a = M.local_matching(x, F, 0.9, 0, match_key, target_stride=4)

        agreements = []
        for scale in (0.1, 0.3):
            delta = scale * jax.random.normal(
                jax.random.fold_in(key, 2), x.shape)
            plan_b = M.local_matching(x + delta, F, 0.9, 0, match_key,
                                      target_stride=4)
            # same dst frame choice (same key) => same a/b partition;
            # compare merged-set membership and dst assignments.
            keep_a = set(np.asarray(plan_a.merge_gather)[0].tolist())
            keep_b = set(np.asarray(plan_b.merge_gather)[0].tolist())
            overlap = len(keep_a & keep_b) / len(keep_a)
            same_dst = float(np.mean(
                np.asarray(plan_a.unmerge_gather)
                == np.asarray(plan_b.unmerge_gather)))
            agreements.append((overlap, same_dst))

        # iid noise is the adversarial case for matching stability (scores
        # nearly tied everywhere); even here plans agree on >80% of tokens.
        # 10% perturbation (adjacent blocks):
        assert agreements[0][0] > 0.8, agreements
        assert agreements[0][1] > 0.8, agreements
        # 30% perturbation (blocks further apart): still mostly aligned.
        assert agreements[1][0] > 0.75, agreements


class TestLenQuantization:
    def test_quantize_r_values(self):
        # L0 512p local: S=12288, r=11059, D=4096 -> merged 5325 -> 5120
        assert M.quantize_r(12288, 11059, 4096, 1024) == 11264
        # disabled
        assert M.quantize_r(12288, 11059, 4096, None) == 11059
        # mid-length (L1: merged 1332): effective quantum shrinks to 256
        # -> 1332 lands on 1280, a mask-free 256-multiple
        assert M.quantize_r(3072, 2764, 1024, 1024) == 2764 + 52
        # sequences below min_len untouched
        assert M.quantize_r(768, 691, 256, 1024) == 691
        # never drops more than half the unmerged set
        assert M.quantize_r(8192, 8192 - 600, 4096, 1024) == 8192 - 600

    def test_local_matching_quantized_length(self):
        key = jax.random.key(0)
        F, tnum, C = 4, 4096, 8
        x = jax.random.normal(key, (1, F * tnum, C), jnp.bfloat16)
        plan = M.local_matching(x, F, 0.9, 0, key, target_stride=4,
                                len_quantum=1024)
        assert plan.merged_len == 5120
        merged = M.merge(x, plan)
        back = M.unmerge(merged, plan)
        assert back.shape == x.shape

    def test_merged_local_len_matches_plan(self):
        from vidtome_tpu.models.tome import ToMeConfig

        key = jax.random.key(0)
        cfg = ToMeConfig(frames=4, local_merge_ratio=0.9, len_quantum=1024)
        x = jax.random.normal(key, (1, 4 * 4096, 8), jnp.bfloat16)
        merged, _ = M.compute_local_merge(x, 4, 0.9, key, target_stride=4,
                                          len_quantum=1024)
        assert merged.shape[1] == cfg.merged_local_len(4096) == 5120


class TestStructuredMerge:
    @pytest.mark.slow
    def test_structured_equals_plain_gather(self):
        """The slice-based replace merge must match the raw merge_gather
        path bit-for-bit (local multi-run + global single-run + prefix)."""
        key = jax.random.key(3)
        x = jax.random.normal(key, (2, 8 * 64, 16), jnp.float32)
        # two rounds: F=8 stride 4 -> 2 dst frames, then unm_pre > 0
        tokens, plans = M.compute_local_merge(x, 8, 0.7, key,
                                              target_stride=4)
        cur = x
        for p in plans:
            assert p.dst_run_len is not None
            structured = M.merge(cur, p)
            plain = jnp.take_along_axis(cur, p.merge_gather[..., None],
                                        axis=1)
            np.testing.assert_array_equal(np.asarray(structured),
                                          np.asarray(plain))
            cur = structured
        cat = jnp.concatenate([tokens, tokens[:, ::-1]], axis=1)
        gp = M.two_set_matching(cat, src_len=tokens.shape[1], ratio=0.6)
        structured = M.merge(cat, gp)
        plain = jnp.take_along_axis(cat, gp.merge_gather[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(structured),
                                      np.asarray(plain))
