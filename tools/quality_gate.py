"""Quality gates for the FLOP-cutting defaults (VERDICT round-2 item 4).

Every lever that deviates from the reference's exact merge semantics
(`/root/reference/vidtome/patch.py:148-169,219-231`) gets a measured
proxy number instead of trust:

  * share_match    — reuse one bipartite matching per resolution level
                     (reference re-matches per block);
  * len_quantum    — round merged lengths down to the attention tile
                     (raises effective ratio 0.9 -> ~0.917);
  * ldm            — merge around cross-attention + feed-forward too
                     (the reference's own LDM-block trade);
  * int8           — W8A8 quantized serving.

Proxy metric (zero-egress: no real SD weights, no reference frames): run
the SAME seed through the exact config and the fast config on the demo
clip and report PSNR between the two outputs, over >=3 seeds.  With
random weights this measures the *mechanical* sensitivity of the pipeline
to the lever — how far the lever moves the output distribution, in the
same units (dB) as the BASELINE fidelity target — not perceptual quality
on natural video.  share_match additionally reports plan overlap: the
fraction of (src->dst) merge assignments shared between per-block
matchings at one level, measured directly on the hidden states.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/quality_gate.py \
      [--gate share_match|len_quantum|ldm|int8|all] [--seeds 3]
      [--frames 16] [--steps 50] [--size 512]

Prints one JSON line per gate; paste results into docs/DESIGN.md §9.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    return 99.0 if mse == 0 else 10.0 * np.log10(1.0 / mse)


def make_config(frames, steps, size, seed, sd_version="1.5",
                **gene_overrides):
    from vidtome_tpu.config import Config

    gene = {
        "control": "none", "guidance_scale": 7.5, "n_timesteps": steps,
        "negative_prompt": "ugly, blurry",
        "prompt": {"edit": "quality gate"},
        "latents_path": "/tmp/qgate", "output_path": "/tmp/qgate",
        "chunk_size": 4, "chunk_ord": "mix-4",
        "local_merge_ratio": 0.9, "merge_global": True,
        "global_merge_ratio": 0.8, "global_rand": 0.5,
        "align_batch": False, "save_frame": False,
    }
    if sd_version == "xl":
        # 1024p activations: decode at batch 2 (the bench_sdxl HBM
        # lesson) and no refiner — gate the base serve path only
        gene.setdefault("batch_size", 2)
    gene.update(gene_overrides)
    return Config({
        "sd_version": sd_version, "height": size, "width": size,
        "seed": seed,
        "work_dir": "/tmp/qgate", "float_precision": "bf16",
        "generation": gene,
    })


GATES = {
    # exact (reference-faithful) setting vs fast (our default) setting
    "share_match": ({"share_match": False}, {"share_match": True}),
    "len_quantum": ({"len_quantum": None}, {"len_quantum": 1024}),
    "ldm": ({}, {"merge_crossattn": True, "merge_ff": True}),
    "int8": ({}, {"quant": "int8"}),
    # deep-feature cache (DeepCache-style serving mode): full UNet every
    # N steps, level-0-only in between
    "deepcache2": ({}, {"cache_interval": 2}),
    "deepcache3": ({}, {"cache_interval": 3}),
    # CFG delta cache: refresh the guidance delta every N steps, run
    # cond-only in between (eps = cond + (gs-1)*delta)
    "cfgcache2": ({}, {"cfg_interval": 2}),
    "cfgcache3": ({}, {"cfg_interval": 3}),
    # combined step-cache profile (bf16) and the full serving profiles
    # (int8 + caches) bench.py reports as "serve"
    "deepcfg32": ({}, {"cache_interval": 3, "cfg_interval": 2}),
    "serve": ({}, {"quant": "int8", "cache_interval": 2}),
    "serve32": ({}, {"quant": "int8", "cache_interval": 3,
                     "cfg_interval": 2}),
    # aligned combined profile: every odd step reuses BOTH caches, every
    # even step refreshes both (no misaligned stale-uncond-deep reads)
    "deepcfg22": ({}, {"cache_interval": 2, "cfg_interval": 2}),
    "serve22": ({}, {"quant": "int8", "cache_interval": 2,
                     "cfg_interval": 2}),
    # non-uniform refresh: dense early full steps (structure formation),
    # interval-3 tail — interval-3 cost at near-interval-2 fidelity?
    "deepcache_w3": ({}, {"cache_schedule": "full:6,uniform:3"}),
    "deepcache_w4": ({}, {"cache_schedule": "full:6,uniform:4"}),
    "serve_w3": ({}, {"quant": "int8",
                      "cache_schedule": "full:6,uniform:3"}),
    # deeper front-loaded schedules (w3 measured 42.5 dB — far above the
    # bar — so push the frontier)
    "deepcache_w5": ({}, {"cache_schedule": "full:6,uniform:5"}),
    "cfgcache_w2": ({}, {"cfg_schedule": "full:6,uniform:2"}),
    # aligned deep-w4 + cfg-w2 (deep refreshes land on cfg-full steps)
    "deepw4_cfgw2": ({}, {"cache_schedule": "full:6,uniform:4",
                          "cfg_schedule": "full:6,uniform:2"}),
    "serve_w42": ({}, {"quant": "int8",
                       "cache_schedule": "full:6,uniform:4",
                       "cfg_schedule": "full:6,uniform:2"}),
    # deeper frontier (serve_w42 measured 38.73 dB — 3.7 dB of margin
    # above the 35 dB bar): deep uniform:6 + cfg uniform:3, and deep
    # uniform:8 + cfg uniform:2 (deep refreshes ⊆ cfg refreshes in both)
    "serve_w63": ({}, {"quant": "int8",
                       "cache_schedule": "full:6,uniform:6",
                       "cfg_schedule": "full:6,uniform:3"}),
    "serve_w82": ({}, {"quant": "int8",
                       "cache_schedule": "full:6,uniform:8",
                       "cfg_schedule": "full:6,uniform:2"}),
    # merge-ratio frontier: the reference's own dials pushed harder
    # (local 0.9 -> 0.95 quadratically shrinks attention FLOPs; global
    # 0.8 -> 0.9 shrinks the bank-matched merge length), alone and on
    # top of the serve profile
    "local95": ({}, {"local_merge_ratio": 0.95}),
    "global9": ({}, {"global_merge_ratio": 0.9}),
    "serve_w42_m95": ({}, {"quant": "int8",
                           "cache_schedule": "full:6,uniform:4",
                           "cfg_schedule": "full:6,uniform:2",
                           "local_merge_ratio": 0.95}),
    # round-4 on-TPU frontier: w63 (37.71 dB) and w82 (37.19 dB) both
    # cleared with >2 dB of margin, so push the merge ratio on top of the
    # deepest cleared schedules too
    "serve_w63_m95": ({}, {"quant": "int8",
                           "cache_schedule": "full:6,uniform:6",
                           "cfg_schedule": "full:6,uniform:3",
                           "local_merge_ratio": 0.95}),
    "serve_w82_m95": ({}, {"quant": "int8",
                           "cache_schedule": "full:6,uniform:8",
                           "cfg_schedule": "full:6,uniform:2",
                           "local_merge_ratio": 0.95}),
    # the full-stack serving profile: every individually-cleared lever
    # at once (int8 37.34 gen-side / deep w82 37.19 / m95 43.24 / g9
    # 43.42 / fused resnet, oracle maxerr ~1e-2)
    "serve_max": ({}, {"quant": "int8",
                       "cache_schedule": "full:6,uniform:8",
                       "cfg_schedule": "full:6,uniform:2",
                       "local_merge_ratio": 0.95,
                       "global_merge_ratio": 0.9,
                       "resnet_mode": "fused"}),
    # eps-reuse step skip (third serving cache, round 4): skipped steps
    # run NO UNet — the DDIM update reuses the cached guidance-combined
    # eps; *x = linear extrapolation along the last refresh slope
    "epscache_w2": ({}, {"eps_schedule": "full:6,uniform:2"}),
    "epscache_w2x": ({}, {"eps_schedule": "full:6,uniform:2",
                          "eps_extrapolate": True}),
    "epscache_w3x": ({}, {"eps_schedule": "full:6,uniform:3",
                          "eps_extrapolate": True}),
    # full-stack profiles with the eps skip on top of serve_max's levers
    # (cadences keep deep ⊆ cfg ⊆ eps-run, so no auto-align repair)
    "serve_maxe2": ({}, {"quant": "int8",
                         "cache_schedule": "full:6,uniform:8",
                         "cfg_schedule": "full:6,uniform:4",
                         "eps_schedule": "full:6,uniform:2",
                         "local_merge_ratio": 0.95,
                         "global_merge_ratio": 0.9,
                         "resnet_mode": "fused"}),
    "serve_maxe2x": ({}, {"quant": "int8",
                          "cache_schedule": "full:6,uniform:8",
                          "cfg_schedule": "full:6,uniform:4",
                          "eps_schedule": "full:6,uniform:2",
                          "eps_extrapolate": True,
                          "local_merge_ratio": 0.95,
                          "global_merge_ratio": 0.9,
                          "resnet_mode": "fused"}),
    # eps-2x skip, but deep/cfg cadences doubled on the surviving run
    # steps (deep {6,22,38} ⊆ cfg {6,14,22,30,38,46} ⊆ eps-run evens):
    # spends maxe2x's 1.76 dB gate margin on shallower run steps instead
    # of more skipped steps (maxe3's route, which missed at 34.6)
    "serve_maxe2d": ({}, {"quant": "int8",
                          "cache_schedule": "full:6,uniform:16",
                          "cfg_schedule": "full:6,uniform:8",
                          "eps_schedule": "full:6,uniform:2",
                          "eps_extrapolate": True,
                          "local_merge_ratio": 0.95,
                          "global_merge_ratio": 0.9,
                          "resnet_mode": "fused"}),
    # eps-3x but with maxe2x-density deep/cfg caching on the surviving
    # run steps (deep/cfg uniform:6 aligns with the eps-3 run set {6+3k};
    # maxe3x's failure may have been its w12/w6 cadences, not eps-3)
    "serve_maxe36": ({}, {"quant": "int8",
                          "cache_schedule": "full:6,uniform:6",
                          "cfg_schedule": "full:6,uniform:6",
                          "eps_schedule": "full:6,uniform:3",
                          "eps_extrapolate": True,
                          "local_merge_ratio": 0.95,
                          "global_merge_ratio": 0.9,
                          "resnet_mode": "fused"}),
    # maxe36 measured 36.4 dB — eps-3 was never the problem; probe eps-4
    # with the same per-run-step density (deep w8 ⊆ cfg w4 ⊆ eps-run 4)
    "serve_maxe48": ({}, {"quant": "int8",
                          "cache_schedule": "full:6,uniform:8",
                          "cfg_schedule": "full:6,uniform:4",
                          "eps_schedule": "full:6,uniform:4",
                          "eps_extrapolate": True,
                          "local_merge_ratio": 0.95,
                          "global_merge_ratio": 0.9,
                          "resnet_mode": "fused"}),
    "serve_maxe3": ({}, {"quant": "int8",
                         "cache_schedule": "full:6,uniform:12",
                         "cfg_schedule": "full:6,uniform:6",
                         "eps_schedule": "full:6,uniform:3",
                         "local_merge_ratio": 0.95,
                         "global_merge_ratio": 0.9,
                         "resnet_mode": "fused"}),
    "serve_maxe3x": ({}, {"quant": "int8",
                          "cache_schedule": "full:6,uniform:12",
                          "cfg_schedule": "full:6,uniform:6",
                          "eps_schedule": "full:6,uniform:3",
                          "eps_extrapolate": True,
                          "local_merge_ratio": 0.95,
                          "global_merge_ratio": 0.9,
                          "resnet_mode": "fused"}),
    # bf16 frontier (round 5): int8 measured ~zero loop speedup on this
    # workload (BENCH_r04 int8 22.8s vs bf16 22.94s — the loop is
    # structure-bound, not MXU-bound) while costing fidelity headroom.
    # Drop the quant lever and spend the reclaimed dB on DEEPER step
    # schedules — the per-step-kind decomposition
    # (perf/stepkinds_r5.json) shows full refresh steps (423ms) are 64%
    # of the maxe2x serve wall while eps-skips cost 4.5ms.
    "serve_maxe2xb": ({}, {"cache_schedule": "full:6,uniform:8",
                           "cfg_schedule": "full:6,uniform:4",
                           "eps_schedule": "full:6,uniform:2",
                           "eps_extrapolate": True,
                           "local_merge_ratio": 0.95,
                           "global_merge_ratio": 0.9,
                           "resnet_mode": "fused"}),
    "serve_maxe36b": ({}, {"cache_schedule": "full:6,uniform:6",
                           "cfg_schedule": "full:6,uniform:6",
                           "eps_schedule": "full:6,uniform:3",
                           "eps_extrapolate": True,
                           "local_merge_ratio": 0.95,
                           "global_merge_ratio": 0.9,
                           "resnet_mode": "fused"}),
    "serve_maxe3xb": ({}, {"cache_schedule": "full:6,uniform:12",
                           "cfg_schedule": "full:6,uniform:6",
                           "eps_schedule": "full:6,uniform:3",
                           "eps_extrapolate": True,
                           "local_merge_ratio": 0.95,
                           "global_merge_ratio": 0.9,
                           "resnet_mode": "fused"}),
    # full-prefix reduction: the all-full warmup prefix is 6 x 423ms =
    # 2.5s of the serve wall all by itself.  Probe shaving it to 4 and 3
    # steps on top of the deep bf16 schedule (cadence phases shift with
    # the prefix; deep ⊆ cfg ⊆ eps-run still holds: 4+12k ⊆ 4+6k ⊆ 4+3k
    # and 3+12k ⊆ 3+6k ⊆ 3+3k).
    "serve_maxe3xbf4": ({}, {"cache_schedule": "full:4,uniform:12",
                             "cfg_schedule": "full:4,uniform:6",
                             "eps_schedule": "full:4,uniform:3",
                             "eps_extrapolate": True,
                             "local_merge_ratio": 0.95,
                             "global_merge_ratio": 0.9,
                             "resnet_mode": "fused"}),
    "serve_maxe3xbf3": ({}, {"cache_schedule": "full:3,uniform:12",
                             "cfg_schedule": "full:3,uniform:6",
                             "eps_schedule": "full:3,uniform:3",
                             "eps_extrapolate": True,
                             "local_merge_ratio": 0.95,
                             "global_merge_ratio": 0.9,
                             "resnet_mode": "fused"}),
    # batched-chunk step (generation.chunk_batch, round 5): chunks 2..K
    # of every timestep run as ONE UNet call; every batched chunk
    # global-merges against the FIRST chunk's bank (star topology)
    # instead of its predecessor's (chain), and the batched chunks share
    # one matching draw.  chunk_batch isolates the deviation; the xbB
    # gate stacks it on the shipped serve schedule.
    "chunk_batch": ({}, {"chunk_batch": True}),
    "serve_maxe3xbB": ({}, {"cache_schedule": "full:6,uniform:12",
                            "cfg_schedule": "full:6,uniform:6",
                            "eps_schedule": "full:6,uniform:3",
                            "eps_extrapolate": True,
                            "local_merge_ratio": 0.95,
                            "global_merge_ratio": 0.9,
                            "resnet_mode": "fused",
                            "chunk_batch": True}),
    # fused cross-attention sublayer (ops/sublayer.py) on the shipped
    # schedule: numerics shift only at fusion rounding points, but the
    # artifact rule is the artifact rule
    "serve_maxe3xbs": ({}, {"cache_schedule": "full:6,uniform:12",
                            "cfg_schedule": "full:6,uniform:6",
                            "eps_schedule": "full:6,uniform:3",
                            "eps_extrapolate": True,
                            "local_merge_ratio": 0.95,
                            "global_merge_ratio": 0.9,
                            "resnet_mode": "fused",
                            "sublayer_mode": "fused"}),
    # quadratic eps extrapolation (round 5): the skip predictor fits a
    # Newton-form quadratic through the last THREE refreshes instead of a
    # line through two.  maxe3xb2 isolates the order-2 dB delta on the
    # shipped cadence; maxe4xb2 spends it on the next-deeper eps cadence
    # (uniform:4, with cfg deepened to w12 so deep ⊆ cfg ⊆ eps-run holds
    # without auto-align repairs); maxe4xb2c6 keeps cfg at the gated w6
    # (the eps-run mask auto-aligns upward over the extra cfg refreshes —
    # strictly more compute, a middle point on the speed/dB curve).
    "serve_maxe3xb2": ({}, {"cache_schedule": "full:6,uniform:12",
                            "cfg_schedule": "full:6,uniform:6",
                            "eps_schedule": "full:6,uniform:3",
                            "eps_extrapolate": 2,
                            "local_merge_ratio": 0.95,
                            "global_merge_ratio": 0.9,
                            "resnet_mode": "fused"}),
    "serve_maxe4xb2": ({}, {"cache_schedule": "full:6,uniform:12",
                            "cfg_schedule": "full:6,uniform:12",
                            "eps_schedule": "full:6,uniform:4",
                            "eps_extrapolate": 2,
                            "local_merge_ratio": 0.95,
                            "global_merge_ratio": 0.9,
                            "resnet_mode": "fused"}),
    "serve_maxe4xb2c6": ({}, {"cache_schedule": "full:6,uniform:12",
                              "cfg_schedule": "full:6,uniform:6",
                              "eps_schedule": "full:6,uniform:4",
                              "eps_extrapolate": 2,
                              "local_merge_ratio": 0.95,
                              "global_merge_ratio": 0.9,
                              "resnet_mode": "fused"}),
    # piecewise eps cadence (every:NxK segments): w3 through the
    # structure-forming mid-trajectory, w4 for the low-noise tail where
    # eps varies slowest — a frontier point between maxe3xb and maxe4xb2
    "serve_maxe34xb2": ({}, {"cache_schedule": "full:6,uniform:12",
                             "cfg_schedule": "full:6,uniform:6",
                             "eps_schedule": "full:6,every:3x18,uniform:4",
                             "eps_extrapolate": 2,
                             "local_merge_ratio": 0.95,
                             "global_merge_ratio": 0.9,
                             "resnet_mode": "fused"}),
    # chunk-size push (round 5): larger chunks batch more frames per UNet
    # call (better MXU utilization, half/quarter the bank merges and
    # dispatches) AND merge harder locally — local F->1 merging over 8/16
    # frames compresses the joined sequence more than twice 4-frame
    # chunks, so total attention FLOPs DROP (~31% at c8 for equal token
    # budgets).  Exact side stays the reference default chunk_size 4.
    "chunk8": ({}, {"chunk_size": 8}),
    "chunk16": ({}, {"chunk_size": 16}),
    "serve_maxe3xbc8": ({}, {"cache_schedule": "full:6,uniform:12",
                             "cfg_schedule": "full:6,uniform:6",
                             "eps_schedule": "full:6,uniform:3",
                             "eps_extrapolate": True,
                             "local_merge_ratio": 0.95,
                             "global_merge_ratio": 0.9,
                             "resnet_mode": "fused",
                             "chunk_size": 8}),
    "serve_maxe3xbc16": ({}, {"cache_schedule": "full:6,uniform:12",
                              "cfg_schedule": "full:6,uniform:6",
                              "eps_schedule": "full:6,uniform:3",
                              "eps_extrapolate": True,
                              "local_merge_ratio": 0.95,
                              "global_merge_ratio": 0.9,
                              "resnet_mode": "fused",
                              "chunk_size": 16}),
    # chunk-boundary deviation (VERDICT r3 item 4): exact side = the
    # reference's ragged-first-chunk semantics (no wraparound chunk,
    # pads never scheduled — generate.py:172-203), fast side = our
    # rotation redesign.  chunk_ragged_pad additionally runs at a frame
    # count that needs padding, so it also measures the padded-duplicate
    # participation deviation (ragged mode never schedules pad frames).
    "chunk_ragged": ({"chunk_boundaries": "ragged"}, {}),
    "chunk_ragged_pad": ({"chunk_boundaries": "ragged"}, {}),
}

# chunk_ragged_pad must run at a frame count that needs padding

# Inversion-side gates (VERDICT r3 item 3): exact-vs-fast INVERSION of the
# same clip, judged JOINTLY — the fast inverted latents feed one exact
# generation pass and the PSNR is taken between the two generations'
# outputs (inversion feeds everything downstream, so its error must be
# measured through the consumer).  Schedule specs run in inversion step
# order: "full:K" refreshes the LOW-noise end; the _rev variants flip the
# mask to refresh the high-noise end (see pipeline/inverter.py).
INV_GATES = {
    "inv_int8": ({}, {"quant": "int8"}),
    "inv_cache2": ({}, {"cache_interval": 2}),
    "inv_cache_w4": ({}, {"cache_schedule": "full:6,uniform:4"}),
    "inv_cache_w4_rev": ({}, {"cache_schedule": "full:6,uniform:4",
                              "cache_reverse": True}),
    "inv_cache_w3": ({}, {"cache_schedule": "full:6,uniform:3"}),
    "inv_int8_w3": ({}, {"quant": "int8",
                         "cache_schedule": "full:6,uniform:3"}),
    # inv_int8_w3 measured 34.76 dB on TPU — 0.24 dB under the bar while
    # both levers clear individually (int8 37.34, cache_w3 35.91) — so
    # probe two gentler combinations: shallower tail, and more full steps
    "inv_int8_w2": ({}, {"quant": "int8",
                         "cache_schedule": "full:6,uniform:2"}),
    "inv_int8_w3f12": ({}, {"quant": "int8",
                            "cache_schedule": "full:12,uniform:3"}),
    # eps-reuse step skip on the inversion loop (skipped steps run no
    # UNet; specs in inversion step order — see pipeline/inverter.py)
    "inv_eps_w2": ({}, {"eps_schedule": "full:6,uniform:2"}),
    "inv_eps_w2x": ({}, {"eps_schedule": "full:6,uniform:2",
                         "eps_extrapolate": True}),
    # inv_eps_w2x measured 34.75 dB / inv_eps_w2 34.97 dB on TPU —
    # extrapolation HURTS in inversion (the linear slope assumes the
    # generation-direction trajectory), and the plain hold sits 0.03 dB
    # under the bar.  Deepen the full prefix like inv_int8_w3f12's probe,
    # extrapolation off:
    "inv_eps_w2f12": ({}, {"eps_schedule": "full:12,uniform:2",
                           "eps_extrapolate": True}),
    "inv_eps_w2f12n": ({}, {"eps_schedule": "full:12,uniform:2"}),
    "inv_eps_w2f16n": ({}, {"eps_schedule": "full:16,uniform:2"}),
    # inv_eps_w3x measured 35.25 dB on TPU — every-3 WITH extrapolation
    # clears while every-2 misses either way (the hold error at w2's
    # phase lands worse than the extrapolated w3 trajectory).  Probe one
    # deeper cadence:
    "inv_eps_w4x": ({}, {"eps_schedule": "full:6,uniform:4",
                         "eps_extrapolate": True}),
    "inv_eps_w3x": ({}, {"eps_schedule": "full:6,uniform:3",
                         "eps_extrapolate": True}),
    # quadratic skip predictor on the inversion loop (inv_eps_w4x linear
    # measured 29.62 dB — the w3->w4 cliff is steep; these measure how
    # much of it order 2 recovers, and whether order 2 pads w3's margin)
    "inv_eps_w3x2": ({}, {"eps_schedule": "full:6,uniform:3",
                          "eps_extrapolate": 2}),
    "inv_eps_w4x2": ({}, {"eps_schedule": "full:6,uniform:4",
                          "eps_extrapolate": 2}),
    # interleaved deep-shallow + eps-skip: run steps at evens (deep-full
    # every 6th, shallow otherwise), eps-skip the odd steps
    "inv_cache_w6_eps_w2": ({}, {"cache_schedule": "full:6,uniform:6",
                                 "eps_schedule": "full:6,uniform:2"}),
    "inv_cache_w6_eps_w2x": ({}, {"cache_schedule": "full:6,uniform:6",
                                  "eps_schedule": "full:6,uniform:2",
                                  "eps_extrapolate": True}),
}


def make_inv_config(frames, steps, size, seed, **inv_overrides):
    from vidtome_tpu.config import Config

    inv = {
        "prompt": "a synthetic gradient clip", "steps": steps,
        "save_steps": steps, "batch_size": 8, "force": True,
        "recon": False, "control": "none", "n_frames": frames,
    }
    inv.update(inv_overrides)
    return Config({
        "sd_version": "1.5", "height": size, "width": size, "seed": seed,
        "work_dir": "/tmp/qgate_inv", "float_precision": "bf16",
        "inversion": inv,
    })


def make_clip(n_frames, size, seed):
    """Deterministic moving-gradient clip [n, size, size, 3] in [0, 1]
    (same family as tests/helpers.make_tiny_video, phase-shifted by seed)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    frames = []
    for i in range(n_frames):
        phase = i / max(n_frames, 1) + 0.173 * seed
        r = 0.5 + 0.5 * np.sin(2 * np.pi * (xx + phase))
        g = 0.5 + 0.5 * np.cos(2 * np.pi * (yy + phase / 2))
        b = np.full_like(r, 0.3) + 0.2 * (phase % 1.0)
        frames.append(np.clip(np.stack([r, g, b], -1), 0, 1))
    return np.stack(frames)


def run_inv_gate(bundle, gate, args, gen_cache):
    """One inversion gate: invert the clip exact vs fast, push BOTH
    inverted latents through the SAME exact generation, PSNR the decoded
    outputs.

    Each side's Inverter is built ONCE and reused across seeds (inversion
    is deterministic given the clip; the seed varies the clip itself) —
    re-tracing the scanned step per seed dominated gate wall time on the
    1-core TPU host."""
    from vidtome_tpu.core import chunk as chunking
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.pipeline.inverter import Inverter

    exact_over, fast_over = INV_GATES[gate]
    side_invs = []
    for over in (exact_over, fast_over):
        cfg = make_inv_config(args.frames, args.steps, args.size, 123,
                              **over)
        side_invs.append(Inverter(bundle, cfg))
    conds = side_invs[0].text([str(side_invs[0].prompt)] * args.frames)
    vals = []
    for seed in range(args.seeds):
        clip = jnp.asarray(make_clip(args.frames, args.size, seed),
                           jnp.float32)
        latents = side_invs[0].vae.encode(clip)
        inverted = []
        for inv in side_invs:
            inverted.append(inv._run(jnp.copy(latents), conds, None, None,
                                     inversion=True))
        if "gen" not in gen_cache:
            cfg = make_config(args.frames, args.steps, args.size, 123)
            gen = Generator(bundle, cfg)
            gen.configure_frames(args.frames)
            gen.depth = None
            gen.control_images = None
            gen_cache["gen"] = gen
            gen_cache["ctx"] = gen.text.embed_cfg("quality gate",
                                                  "ugly, blurry")
        gen, ctx = gen_cache["gen"], gen_cache["ctx"]
        outs = []
        for lat in inverted:
            clean = gen.ddim_sample(jnp.copy(lat.astype(jnp.bfloat16)), ctx)
            outs.append(np.asarray(
                gen.vae.decode(clean[: args.frames]), np.float32))
        vals.append(psnr(outs[0], outs[1]))
        print(f"[gate:{gate}] seed {seed}: {vals[-1]:.2f} dB",
              file=sys.stderr)
    return vals


def run_gen_gate(bundle, gate, args, exact_cache=None):
    """One generation gate: sample the same init noise through the exact
    and the fast config, PSNR the decoded outputs, over args.seeds seeds.

    Each side's Generator is built ONCE (config seed fixed at 123 — the
    merge-randomness/chunk-schedule key) and reused across seeds; only the
    init noise varies per seed.  Re-tracing the 10-step scanned sample
    block per (seed, side) dominated gate wall time on the 1-core host.

    exact_cache (optional dict) memoizes the EXACT side's decoded frames
    across gates within one process: every serve-frontier gate shares the
    same exact config, so a 5-gate run only pays for the exact sampling
    once per seed instead of once per (gate, seed)."""
    from vidtome_tpu.pipeline.generator import Generator

    exact_over, fast_over = GATES[gate]
    n_frames = args.frames
    if gate == "chunk_ragged_pad" and n_frames % 4 == 0:
        n_frames -= 2  # force pad slots (32 -> 30 at default scale)
    latent = args.size // 8

    def build(over):
        cfg = make_config(n_frames, args.steps, args.size, 123,
                          sd_version=getattr(args, "sd", "1.5"), **over)
        gen = Generator(bundle, cfg)
        gen.configure_frames(n_frames)
        gen.depth = None
        gen.control_images = None
        return gen

    exact_key = (repr(sorted(exact_over.items(), key=repr)), n_frames)
    fast_gen = build(fast_over)
    exact_gen = None  # built lazily only if a seed misses the cache
    # _build_context, not text.embed_cfg: the SDXL family wraps the
    # context with (pooled, time_ids) — embed_cfg alone unpacks wrong
    # under --sd xl (negative prompt comes from the config either way)
    ctx = fast_gen._build_context("quality gate")
    vals = []
    for seed in range(args.seeds):
        init = jax.random.normal(
            jax.random.key(1000 + seed),
            (n_frames, latent, latent, 4), jnp.bfloat16)
        cache_key = exact_key + (seed,)
        exact_out = None if exact_cache is None else exact_cache.get(cache_key)
        if exact_out is None:
            if exact_gen is None:
                exact_gen = build(exact_over)
            clean = exact_gen.ddim_sample(jnp.copy(init[exact_gen.pad_src]),
                                          ctx)
            exact_out = np.asarray(
                exact_gen.vae.decode(clean[: n_frames]), np.float32)
            if exact_cache is not None:
                exact_cache[cache_key] = exact_out
        clean = fast_gen.ddim_sample(jnp.copy(init[fast_gen.pad_src]), ctx)
        fast_out = np.asarray(
            fast_gen.vae.decode(clean[: n_frames]), np.float32)
        vals.append(psnr(exact_out, fast_out))
        print(f"[gate:{gate}] seed {seed}: {vals[-1]:.2f} dB",
              file=sys.stderr)
    return n_frames, vals


def _write_gate_artifact(gate, rec, gates_dir=None):
    """Persist a measurement artifact: bench.py sources its serve_gate_db
    from gates/<gate>.json instead of a literal."""
    import os

    if gates_dir is None:
        gates_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "gates")
    os.makedirs(gates_dir, exist_ok=True)
    rec = dict(rec)
    rec["backend"] = jax.devices()[0].platform
    rec["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(os.path.join(gates_dir, f"{gate}.json"), "w") as f:
        json.dump(rec, f, indent=1)


def share_match_plan_overlap(bundle, frames, size, seed):
    """Fraction of identical (src_idx -> dst_idx) merge assignments
    between the first block's matching and a fresh matching computed one
    sibling later in the UNet (hidden states one attention+ff apart)."""
    from vidtome_tpu.core import merge as merge_ops

    latent = size // 8
    key = jax.random.key(seed)
    x = jax.random.normal(key, (2, 4 * latent * latent, 320), jnp.bfloat16)
    # surrogate for the sibling block's slightly-evolved hidden states:
    # same signal + small update (one block's residual is small relative
    # to the stream)
    dx = 0.15 * jax.random.normal(jax.random.fold_in(key, 1), x.shape,
                                  jnp.bfloat16)
    # mode="mean" materializes src_idx/dst_idx for introspection
    _, plans_a = merge_ops.compute_local_merge(
        x, 4, 0.9, jax.random.fold_in(key, 2), mode="mean")
    _, plans_b = merge_ops.compute_local_merge(
        x + dx, 4, 0.9, jax.random.fold_in(key, 2), mode="mean")
    pa, pb = plans_a[0], plans_b[0]

    def pairs(p):
        src = np.asarray(jnp.take_along_axis(p.a_idx, p.src_idx, axis=1))
        dst = np.asarray(jnp.take_along_axis(p.b_idx, p.dst_idx, axis=1))
        return {(int(s), int(d)) for s, d in zip(src[0], dst[0])}

    sa, sb = pairs(pa), pairs(pb)
    return len(sa & sb) / max(len(sa), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", default="all",
                    help="gate name, comma-separated list of gate names, "
                         "'all' (generation gates) or 'inv_all' "
                         "(inversion gates); one process measures them "
                         "all in order")
    ap.add_argument("--seeds", type=int, default=3)
    # default 32 frames: the fast-side configs then reuse the bench
    # executables from the compilation cache (same shapes), so only the
    # exact-side variants compile fresh
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--sd", default="1.5",
                    help="model family to gate (1.5 default; 'xl' gates "
                         "the SDXL base pipeline — artifacts get an _xl "
                         "suffix so they can't shadow the 512p gates)")
    args = ap.parse_args()

    from vidtome_tpu.models.registry import init_model

    bundle = init_model(sd_version=args.sd, weight_dtype="bf16")
    suffix = "" if args.sd == "1.5" else f"_{args.sd}"
    latent = args.size // 8
    if args.gate == "all":
        gates = list(GATES)
    elif args.gate == "inv_all":
        gates = list(INV_GATES)
    else:
        gates = [g.strip() for g in args.gate.split(",") if g.strip()]
        unknown = [g for g in gates if g not in GATES and g not in INV_GATES]
        if unknown:
            ap.error(f"unknown gate(s): {unknown}")

    inv_gen_cache: dict = {}
    exact_cache: dict = {}
    for gate in gates:
        t0 = time.time()
        if gate in INV_GATES:
            if suffix:
                ap.error(f"inversion gates are 1.5-only (got --sd "
                         f"{args.sd} for {gate})")
            vals = run_inv_gate(bundle, gate, args, inv_gen_cache)
            rec = {
                "gate": gate,
                "psnr_exact_vs_fast_db": [round(v, 2) for v in vals],
                "psnr_mean_db": round(float(np.mean(vals)), 2),
                "seeds": args.seeds, "frames": args.frames,
                "steps": args.steps, "size": args.size,
                "harness": "joint: exact-vs-fast inversion -> exact generation",
                "protocol": "per-seed clip; fixed inverter config (seed 123)",
                "weights": "random (zero-egress proxy)",
                "elapsed_s": round(time.time() - t0, 1),
            }
            print(json.dumps(rec))
            _write_gate_artifact(gate, rec)
            continue
        n_frames, vals = run_gen_gate(bundle, gate, args, exact_cache)
        rec = {
            "gate": gate + suffix,
            "psnr_exact_vs_fast_db": [round(v, 2) for v in vals],
            "psnr_mean_db": round(float(np.mean(vals)), 2),
            "seeds": args.seeds, "frames": n_frames,
            "steps": args.steps, "size": args.size,
            "sd_version": args.sd,
            "protocol": "per-seed init noise; fixed merge/chunk key (123)",
            "weights": "random (zero-egress proxy)",
            "elapsed_s": round(time.time() - t0, 1),
        }
        if gate == "share_match":
            rec["plan_overlap"] = round(float(np.mean([
                share_match_plan_overlap(bundle, args.frames, args.size, s)
                for s in range(args.seeds)])), 4)
        print(json.dumps(rec))
        _write_gate_artifact(gate + suffix, rec)


if __name__ == "__main__":
    main()
