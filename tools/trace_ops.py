"""True per-op time breakdown of the production sample block.

Captures a jax.profiler trace of one warm `_sample_block` dispatch and
aggregates TPU-device event durations by fusion/op name, so MFU work
targets measured costs instead of microbench guesses (microbenches carry
per-dispatch overhead that fuses away in the real graph).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_ops.py
"""

from __future__ import annotations

import collections
import glob
import os
import re
import time

import jax
import jax.numpy as jnp

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

from vidtome_tpu.config import Config
from vidtome_tpu.core import chunk as chunking
from vidtome_tpu.models.registry import init_model
from vidtome_tpu.pipeline.generator import Generator


def _event_stats(ev) -> dict:
    """Best-effort extraction of an xplane event's stats as a dict."""
    out = {}
    try:
        for s in ev.stats:
            try:  # stat may be a (name, value) pair or an object
                k, v = s
            except Exception:
                k = getattr(s, "name", None)
                v = getattr(s, "value", None)
            if k is not None:
                out[str(k)] = v
    except Exception:
        pass
    return out


def _classify(text: str, stats: dict | None = None) -> str:
    """Bucket an XLA op event into a component family.

    xplane event names are FULL HLO instruction strings (name, shape,
    opcode, operand list), so substring matching over the whole text
    misattributes (operand names mention custom-calls/converts).  Parse
    the instruction name + opcode instead.  XLA:TPU names dot-rooted
    fusions with the default "fusion.N"; elementwise/reduce-rooted ones
    get descriptive names (add_add_fusion, convert_reduce_fusion...)."""
    m = re.match(r"%?([\w.\-]+) = .*? ([a-z\-]+)\(", text)
    name, opcode = ((m.group(1), m.group(2)) if m
                    else (text.split()[0].lstrip("%"), "?"))
    base = re.sub(r"\.\d+$", "", name)
    if opcode == "custom-call":
        return f"pallas:{base}"
    if opcode == "convolution":
        return "conv"
    if opcode == "dot":
        return "matmul"
    if opcode == "fusion":
        if base == "fusion":
            return "matmul-fusion"
        root = base.replace("_fusion", "")
        if "convolution" in root:
            return "conv-fusion"
        if "reduce" in root:
            return "reduce-fusion"
        return "eltwise-fusion"
    if opcode in ("copy", "transpose", "bitcast", "reshape", "pad",
                  "slice", "broadcast"):
        return "copy/layout"
    if "sort" in opcode:
        return "sort"
    return f"op:{opcode}"


def main():
    import sys
    int8 = "--int8" in sys.argv
    gn_mode = next((a.split("=")[1] for a in sys.argv
                    if a.startswith("--gn=")), None)
    if gn_mode:
        os.environ["VIDTOME_GN_MODE"] = gn_mode
    ldm = "--ldm" in sys.argv
    cache = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--cache=")), 0))
    cfg_iv = int(next((a.split("=")[1] for a in sys.argv
                       if a.startswith("--cfg=")), 0))
    cache_sched = next((a.split("=", 1)[1] for a in sys.argv
                        if a.startswith("--cache-schedule=")), None)
    cfg_sched = next((a.split("=", 1)[1] for a in sys.argv
                      if a.startswith("--cfg-schedule=")), None)
    resnet_mode = next((a.split("=", 1)[1] for a in sys.argv
                        if a.startswith("--resnet=")), "off")
    # --profile=maxe2x etc: trace a full bench.SERVE_PROFILES entry
    # (int8 + deep/CFG/eps schedules + ratios) — the device time of the
    # serve loop, per step averaged over one block
    profile = next((a.split("=", 1)[1] for a in sys.argv
                    if a.startswith("--profile=")), None)
    # which 10-step block to trace: 1 (default) = steady-state cadence;
    # 0 = the all-full warmup prefix ("full:6,..." specs), which is the
    # dominant serve wall slice (10 x 472ms of 6.88s at maxe3xb,
    # perf/stepkinds_maxe3xb_r5.json)
    trace_block = int(next((a.split("=")[1] for a in sys.argv
                            if a.startswith("--block=")), 1))
    frames, steps, size = 32, 50, 512
    latent = size // 8
    gene_extra = {}
    if profile:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))), "bench.py"))
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        gene_extra = dict(bench.SERVE_PROFILES[profile])
    bundle = init_model(sd_version="1.5", weight_dtype="bf16")
    cfg = Config({
        "sd_version": "1.5", "height": size, "width": size,
        "seed": 123, "work_dir": "/tmp/bench", "float_precision": "bf16",
        "generation": {
            "control": "none", "guidance_scale": 7.5,
            "n_timesteps": steps, "negative_prompt": "ugly, blurry",
            "prompt": {"edit": "benchmark prompt"},
            "latents_path": "/tmp/bench", "output_path": "/tmp/bench",
            "chunk_size": 4, "chunk_ord": "mix-4",
            "local_merge_ratio": 0.9, "merge_global": True,
            "global_merge_ratio": 0.8, "global_rand": 0.5,
            "align_batch": False, "save_frame": False,
            "quant": "int8" if int8 else "none",
            "merge_crossattn": ldm, "merge_ff": ldm,
            "cache_interval": cache, "cfg_interval": cfg_iv,
            "cache_schedule": cache_sched, "cfg_schedule": cfg_sched,
            "resnet_mode": resnet_mode,
            **gene_extra,
        },
    })
    gen = Generator(bundle, cfg)
    gen.configure_frames(frames)
    gen.depth = None
    gen.control_images = None
    latents = jax.random.normal(
        jax.random.key(0), (gen.n_padded, latent, latent, 4), jnp.bfloat16)
    context = gen.text.embed_cfg("a benchmark prompt", "ugly, blurry")

    t0 = time.time()
    gen.warmup(latents, context)
    print(f"warmup {time.time() - t0:.1f}s")

    import numpy as np

    rng = np.random.default_rng(0)
    fidx_table = jnp.asarray(chunking.build_fidx_table(
        gen.n_padded, 4, rng, steps, chunk_ord="mix", perm_div=4.0,
        merge_global=True), jnp.int32)
    zero = jnp.zeros((), jnp.bfloat16)
    gs = jnp.asarray(7.5, jnp.float32)
    block = gen._block_size()

    x = jnp.copy(latents)
    deep = gen._cache_buffers(x)
    zero_i = jnp.asarray(0, jnp.int32)
    modes = gen._mode_masks()
    # warm run to compile + (for --block=1, the default) advance through
    # the schedule warmup steps so the traced block is the STEADY-STATE
    # cadence region; --block=0 instead re-traces the all-full warmup
    # prefix itself (the dominant serve wall slice)
    x, deep = gen._sample_block(gen._params, x, deep, zero_i, modes,
                                fidx_table, context, zero, zero, zero, gs,
                                n_steps=block)
    _ = float(jnp.sum(x))
    start = jnp.asarray(trace_block * block, jnp.int32)
    if trace_block == 0:
        # re-run block 0 warm on fresh buffers (same executable)
        x = jnp.copy(latents)
        deep = gen._cache_buffers(x)

    trace_dir = "/tmp/trace_ops"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        x, deep = gen._sample_block(gen._params, x, deep, start, modes,
                                    fidx_table, context, zero, zero, zero,
                                    gs, n_steps=block)
        _ = float(jnp.sum(x))

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane under {trace_dir}"
    data = jax.profiler.ProfileData.from_file(files[0])
    by_name: dict[str, float] = collections.defaultdict(float)
    by_cat: dict[str, float] = collections.defaultdict(float)
    skipped: dict[str, float] = collections.defaultdict(float)
    total = 0.0
    skip = re.compile(
        r"^%?(while|copy-start|slice-start|copy-done|slice-done|"
        r"all-reduce-start|tuple|get-tuple-element|bitcast|parameter)")
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip module/step lines
            if "xla op" not in lname and "xla ops" not in lname:
                continue
            for ev in line.events:
                m_skip = skip.match(ev.name)
                if m_skip:
                    # loop wrappers + async DMA: excluded from the op
                    # accounting, but TRACKED — if the wall-vs-ops gap
                    # lives here, the DMA is NOT fully overlapped and
                    # that is itself the finding
                    skipped[m_skip.group(1)] += ev.duration_ns / 1e6
                    continue
                dur = ev.duration_ns / 1e6
                # collapse "%fusion.1234" -> "fusion" family for ranking
                fam = re.sub(r"\.\d+.*$", "", ev.name.lstrip("%"))
                by_name[fam] += dur
                by_cat[_classify(ev.name)] += dur
                total += dur
    if total == 0.0:
        # fall back: dump plane/line names to adapt the filter
        for plane in data.planes:
            print("plane:", plane.name,
                  [ln.name for ln in plane.lines][:10])
        return
    n_steps_traced = block
    print(f"\ndevice total {total:.1f}ms over {n_steps_traced} steps "
          f"= {total / n_steps_traced:.1f}ms/step\n")
    print("by category (ms/step):")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {ms / n_steps_traced:8.2f}  "
              f"({ms / total:5.1%})")
    print("\ntop 40 op families (ms/step):")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms / n_steps_traced:8.2f}  {name[:100]}")
    print("\nskipped wrapper/async-DMA events (ms/step, overlap unknown):")
    for name, ms in sorted(skipped.items(), key=lambda kv: -kv[1]):
        print(f"  {ms / n_steps_traced:8.2f}  {name}")
    out_path = next((a.split("=", 1)[1] for a in sys.argv
                     if a.startswith("--out=")), None)
    if out_path:
        import json

        rec = {
            "profile": profile, "block": trace_block,
            "frames": frames, "steps_per_block": block, "size": size,
            "backend": jax.default_backend(),
            "device_ms_per_step": round(total / n_steps_traced, 2),
            "by_category_ms_per_step": {
                k: round(v / n_steps_traced, 3)
                for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])},
            "top_families_ms_per_step": {
                k[:120]: round(v / n_steps_traced, 3)
                for k, v in sorted(by_name.items(),
                                   key=lambda kv: -kv[1])[:40]},
            "skipped_events_ms_per_step": {
                k: round(v / n_steps_traced, 3)
                for k, v in sorted(skipped.items(), key=lambda kv: -kv[1])},
            "scope": "jax.profiler device events of one warm sample "
                     "block, aggregated by op family; skipped_events are "
                     "loop wrappers + async DMA (may overlap compute)",
        }
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
