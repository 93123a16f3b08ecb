"""Capture a jax.profiler device trace of one merge-mode chunk forward and
print the top ops by self time.  Falls back gracefully if the tunneled
backend does not support device tracing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_chunk.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

from vidtome_tpu.models.registry import init_model
from vidtome_tpu.models.tome import ToMeCall, ToMeConfig

TRACE_DIR = "/tmp/vidtome_trace"


def main():
    key = jax.random.key(0)
    bundle = init_model(sd_version="1.5", weight_dtype="bf16")
    x = jax.random.normal(key, (8, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (8, 77, 768), jnp.bfloat16)
    params = bundle.unet_params

    tome = ToMeConfig(frames=4, local_merge_ratio=0.9, merge_global=True,
                      global_merge_ratio=0.8, share_match=True)
    unet = bundle.make_unet(tome=tome)

    @jax.jit
    def init_banks(params, x, ctx, k):
        return unet.apply({"params": params}, x, jnp.asarray(500), ctx,
                          tome_call=ToMeCall(key=k, bank_mode="init"),
                          num_lanes=2, mutable=["tome_bank"])[1]

    banks = init_banks(params, x, ctx, key)

    @jax.jit
    def fwd_merge(params, x, ctx, banks, k):
        out, b = unet.apply({"params": params, "tome_bank": banks}, x,
                            jnp.asarray(500), ctx,
                            tome_call=ToMeCall(key=k, bank_mode="merge"),
                            num_lanes=2, mutable=["tome_bank"])
        return out

    # warm/compile
    out = fwd_merge(params, x, ctx, banks, key)
    _ = float(jnp.sum(out))

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    for i in range(3):
        out = fwd_merge(params, x, ctx, banks, jax.random.fold_in(key, i))
    _ = float(jnp.sum(out))
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(
        TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("NO TRACE FILES — device tracing unsupported on this backend")
        sys.exit(1)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # keep device-lane events (TensorCore); heuristics: pid names
    by_name: dict[str, float] = {}
    for e in events:
        name = e.get("name", "?")
        by_name[name] = by_name.get(name, 0.0) + e["dur"]
    total = sum(by_name.values())
    print(f"trace: {path}  ({len(events)} events, {total/1e3:.1f}ms total)")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:60]:
        print(f"  {dur/1e3:9.3f}ms  {name[:140]}")


if __name__ == "__main__":
    main()
