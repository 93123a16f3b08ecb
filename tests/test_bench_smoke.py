"""Smoke tests for bench.py's measurement helpers at tiny shapes.

bench.py's sidecars call production Generator internals
(`_sample_block`, `_mode_masks`, `_cache_buffers`, chunk-schedule
layouts); a signature or layout change there must fail HERE on CPU, not
at the end of a round on the TPU (round 4 lost its PnP number exactly
that way: the sidecar hand-built a stale 3-D fidx table after the
production layout moved to 4-D [..., (gather, scatter)]).
"""

from __future__ import annotations

import importlib.util
import os
import types

import jax
import jax.numpy as jnp
import pytest

from tests.helpers import make_tiny_bundle

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _load_bench()


@pytest.fixture(scope="module")
def bundle():
    return make_tiny_bundle()


def _args(**kw):
    base = dict(frames=8, steps=4, size=64, ldm=False, int8=False)
    base.update(kw)
    return types.SimpleNamespace(**base)


@pytest.mark.slow
def test_measure_mode_fps_headline_profile(bench, bundle):
    """The default headline serve profile runs through the sidecar at
    tiny shapes (exercises mode_tab/caches/fidx plumbing end to end)."""
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.config import Config

    args = _args()
    latent = args.size // 8
    cfg = Config({
        "sd_version": "tiny", "height": args.size, "width": args.size,
        "seed": 123, "work_dir": "/tmp/bench_smoke",
        "float_precision": "bf16",
        "generation": {
            "control": "none", "guidance_scale": 7.5,
            "n_timesteps": args.steps, "negative_prompt": "bad",
            "prompt": {"edit": "x"}, "latents_path": "/tmp/bench_smoke",
            "output_path": "/tmp/bench_smoke", "chunk_size": 4,
            "chunk_ord": "mix-4", "local_merge_ratio": 0.9,
            "merge_global": True, "global_merge_ratio": 0.8,
            "global_rand": 0.5, "align_batch": False,
            "save_frame": False,
        },
    })
    gen = Generator(bundle, cfg)
    gen.configure_frames(args.frames)
    latents = jax.random.normal(
        jax.random.key(0), (gen.n_padded, latent, latent, 4),
        jnp.bfloat16)
    context = gen.text.embed_cfg("x", "bad")

    # the SHIPPED headline profile (whatever bench currently defaults
    # to — promotion must never outrun this smoke), then the chunk-size
    # push candidate (different chunk table / bank / fidx layouts)
    profile = bench.SERVE_PROFILES[bench.DEFAULT_SERVE_PROFILE]
    fps = bench._measure_mode_fps(bundle, args, latents, context,
                                  "smoke", **profile)
    assert fps > 0
    c8 = bench.SERVE_PROFILES["maxe3xbc8"]
    fps8 = bench._measure_mode_fps(bundle, args, latents, context,
                                   "smoke_c8", **c8)
    assert fps8 > 0


@pytest.mark.slow
def test_measure_pnp_fps(bench, bundle):
    """The PnP sidecar (3 lanes, injection flags, production fidx table
    layout) runs at tiny shapes."""
    args = _args()
    fps = bench._measure_pnp_fps(bundle, args, args.size // 8)
    assert fps > 0


def test_serve_profiles_schema(bench):
    """Every serve profile only uses Generator config keys that exist
    (catches typos that would silently no-op via .get defaults) and maps
    to the gate naming convention quality_gate.py writes."""
    allowed = {"quant", "cache_schedule", "cfg_schedule", "eps_schedule",
               "eps_interval", "cache_interval", "cfg_interval",
               "eps_extrapolate", "local_merge_ratio",
               "global_merge_ratio", "resnet_mode", "sublayer_mode",
               "chunk_boundaries", "chunk_batch",
               "len_quantum", "steps_per_block", "chunk_size"}
    for name, prof in bench.SERVE_PROFILES.items():
        unknown = set(prof) - allowed
        assert not unknown, f"profile {name}: unknown keys {unknown}"
    for name, (prof, gate) in bench.INV_SERVE_PROFILES.items():
        unknown = set(prof) - allowed
        assert not unknown, f"inv profile {name}: unknown keys {unknown}"
        assert gate.startswith("inv_")
