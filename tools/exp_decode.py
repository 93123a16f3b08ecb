"""VAE-decode profiling: where do 10.7s of decode wall (BENCH_r04, 32
frames 512p) actually go?

Decode is ~1/3 of exact generation wall and approaches half of the
serve-profile wall (VERDICT r4 weak-item 5), at an implied ~3% MFU for
the ~1.8 TFLOP/frame decoder — far below any compute or bandwidth
ceiling, so something structural is wrong (dispatch granularity, a
pathological op, or layout copies).  This probe measures, in ONE
long-lived process (tunnel-wedge policy):

  1. batch sweep   — per-frame ms at decode batch 1/2/4/8/16 (+ a
                     single-dispatch lax.map decode of all 32);
  2. per-op trace  — device-time aggregation of one warm decode batch
                     (same xplane machinery as tools/trace_ops.py);
  3. microbenches  — conv3x3 at each decoder scale, groupnorm, nearest
                     upsample via jax.image.resize vs broadcast-reshape.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_decode.py \
        [--frames 32] [--size 512] [--phases time,trace,micro]

Writes perf/decode_profile_r5.json.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys
import time

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _timed(fn, *args, reps=3):
    """Median wall of reps warm calls, completion forced by scalar sum."""
    outs = []
    for _ in range(reps):
        t0 = time.time()
        r = fn(*args)
        _ = float(jnp.sum(r))
        outs.append(time.time() - t0)
    return float(np.median(outs))


def _classify(text: str) -> str:
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
    return f"op:{opcode}"


def trace_aggregate(fn, *args, label="decode"):
    """Run fn under a profiler trace; return {category: ms} + top ops."""
    trace_dir = f"/tmp/trace_{label}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        r = fn(*args)
        _ = float(jnp.sum(r))
    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane under {trace_dir}"
    data = jax.profiler.ProfileData.from_file(files[0])
    by_cat = collections.defaultdict(float)
    by_name = collections.defaultdict(float)
    skip = re.compile(
        r"^%?(while|copy-start|slice-start|copy-done|slice-done|"
        r"tuple|get-tuple-element|bitcast|parameter)")
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            if "xla op" not in line.name.lower():
                continue
            for ev in line.events:
                if skip.match(ev.name):
                    continue
                dur = ev.duration_ns / 1e6
                by_cat[_classify(ev.name)] += dur
                fam = re.sub(r"\.\d+.*$", "", ev.name.lstrip("%"))
                by_name[fam] += dur
    return dict(by_cat), dict(sorted(by_name.items(),
                                     key=lambda kv: -kv[1])[:15])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--phases", default="time,trace,micro")
    args = ap.parse_args()
    phases = set(args.phases.split(","))

    from vidtome_tpu.models.registry import init_model
    from vidtome_tpu.pipeline.common import VAECoder

    out = {"frames": args.frames, "size": args.size,
           "backend": jax.default_backend()}
    latent = args.size // 8
    bundle = init_model(sd_version="1.5", weight_dtype="bf16")
    lat = jax.random.normal(jax.random.key(0),
                            (args.frames, latent, latent, 4), jnp.bfloat16)

    if "time" in phases:
        rows = {}
        for bs in (1, 2, 4, 8):
            coder = VAECoder(bundle, batch_size=bs)
            _ = _timed(coder.decode, lat[:bs], reps=1)  # compile
            full = _timed(coder.decode, lat, reps=2)
            rows[f"batch{bs}"] = {
                "total_s": round(full, 3),
                "ms_per_frame": round(full / args.frames * 1e3, 1)}
            print(f"[decode] batch {bs}: {full:.2f}s total "
                  f"({full / args.frames * 1e3:.0f} ms/frame)",
                  file=sys.stderr)
        # single dispatch: scan over batches inside one executable
        coder = VAECoder(bundle, batch_size=4)
        vae_params = coder._params
        dec = coder._decode

        @jax.jit
        def decode_all(params, x):
            xs = x.reshape(-1, 4, *x.shape[1:])
            return jax.lax.map(lambda b: dec(params, b), xs)

        _ = _timed(decode_all, vae_params, lat, reps=1)
        t = _timed(decode_all, vae_params, lat, reps=2)
        rows["scan4_single_dispatch"] = {
            "total_s": round(t, 3),
            "ms_per_frame": round(t / args.frames * 1e3, 1)}
        print(f"[decode] lax.map(4) single dispatch: {t:.2f}s",
              file=sys.stderr)
        out["batch_sweep"] = rows

    if "trace" in phases:
        coder = VAECoder(bundle, batch_size=4)
        _ = float(jnp.sum(coder._decode(coder._params, lat[:4])))
        cats, tops = trace_aggregate(
            lambda p, x: coder._decode(p, x), coder._params, lat[:4],
            label="vae_decode")
        total = sum(cats.values())
        print(f"[trace] device total {total:.1f}ms for batch-4 decode",
              file=sys.stderr)
        for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {c:24s} {ms:8.2f}ms {ms / max(total, 1e-9):6.1%}",
                  file=sys.stderr)
        print("[trace] top ops:", file=sys.stderr)
        for n, ms in tops.items():
            print(f"  {n:40s} {ms:8.2f}ms", file=sys.stderr)
        out["trace_by_category_ms"] = {k: round(v, 2)
                                       for k, v in cats.items()}
        out["trace_top_ops_ms"] = {k: round(v, 2) for k, v in tops.items()}

    if "micro" in phases:
        micro = {}
        # decoder conv scales: (H, Cin, Cout) per level + upsamplers
        shapes = [(64, 512, 512), (128, 512, 512), (256, 256, 256),
                  (512, 128, 128)]
        for H, Ci, Co in shapes:
            x = jax.random.normal(jax.random.key(1), (4, H, H, Ci),
                                  jnp.bfloat16)
            w = jax.random.normal(jax.random.key(2), (3, 3, Ci, Co),
                                  jnp.bfloat16) * 0.02

            @jax.jit
            def conv(x, w):
                return jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)

            _ = _timed(conv, x, w, reps=1)
            t = _timed(conv, x, w, reps=3)
            fl = 2 * 4 * H * H * Ci * Co * 9
            micro[f"conv3x3_{H}x{H}x{Ci}->{Co}"] = {
                "ms": round(t * 1e3, 2),
                "tflops": round(fl / t / 1e12, 1)}
            print(f"[micro] conv {H}^2 {Ci}->{Co}: {t * 1e3:.2f}ms = "
                  f"{fl / t / 1e12:.0f} TFLOP/s", file=sys.stderr)
        # upsample variants at the worst scale (256 -> 512, C=256)
        x = jax.random.normal(jax.random.key(3), (4, 256, 256, 256),
                              jnp.bfloat16)

        @jax.jit
        def up_resize(x):
            B, H, W, C = x.shape
            return jax.image.resize(x, (B, H * 2, W * 2, C),
                                    method="nearest")

        @jax.jit
        def up_broadcast(x):
            B, H, W, C = x.shape
            y = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (B, H, 2, W, 2, C))
            return y.reshape(B, H * 2, W * 2, C)

        for name, fn in (("resize_nearest", up_resize),
                         ("broadcast_reshape", up_broadcast)):
            _ = _timed(fn, x, reps=1)
            t = _timed(fn, x, reps=3)
            micro[f"upsample_256_{name}"] = {"ms": round(t * 1e3, 2)}
            print(f"[micro] upsample {name}: {t * 1e3:.2f}ms",
                  file=sys.stderr)
        # groupnorm at the big scale
        from vidtome_tpu.models.layers import _group_norm
        import flax.linen as nn

        class GN(nn.Module):
            @nn.compact
            def __call__(self, x):
                return _group_norm(x, "n", silu=True)

        x = jax.random.normal(jax.random.key(4), (4, 512, 512, 128),
                              jnp.bfloat16)
        gn = GN()
        p = gn.init(jax.random.key(0), x)
        f = jax.jit(lambda p, x: gn.apply(p, x))
        _ = _timed(f, p, x, reps=1)
        t = _timed(f, p, x, reps=3)
        micro["groupnorm_512x512x128"] = {"ms": round(t * 1e3, 2)}
        print(f"[micro] groupnorm 512^2x128: {t * 1e3:.2f}ms",
              file=sys.stderr)
        out["micro"] = micro

    os.makedirs(os.path.join(ROOT, "perf"), exist_ok=True)
    path = os.path.join(ROOT, "perf", "decode_profile_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": path}))


if __name__ == "__main__":
    main()
