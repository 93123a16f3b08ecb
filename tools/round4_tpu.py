"""Round-4 TPU measurement plan — ONE long-lived process.

The tunneled v5e wedges when processes churn (two round-3 outages struck
at process-exit/launch boundaries), so every gate/probe runs sequentially
inside this single process via runpy.  Run the moment the TPU revives:

    PYTHONPATH=/root/repo:/root/.axon_site \
        python tools/round4_tpu.py [--phase gates|probes|all] 2>&1 \
        | tee /tmp/round4_tpu.log

Order (most valuable first, so a mid-run wedge still leaves artifacts):
  1. serve_w42 gate            -> gates/serve_w42.json (bench.py reads it)
  2. frontier gates            -> serve_w63 / serve_w82
  3. inversion gates           -> inv_int8 / inv_cache_w3 / inv_cache_w4(_rev)
  4. informational gates       -> cfgcache_w2 / deepw4_cfgw2 / deepcache_w5
  5. exp_resnet                -> fused kernel vs XLA (bf16 + int8 rows)
  6. exp_cache serve row       -> measured ms/step for the serve profile

BENCH_r04.json itself is produced by the driver running bench.py at round
end; this script only produces the artifacts bench.py and DESIGN §9 need.
"""

from __future__ import annotations

import argparse
import os
import runpy
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_tool(script: str, argv: list[str]) -> bool:
    """Execute a tool's main() in-process (same TPU client — no process
    churn).  Never raises: a failing probe must not kill the artifacts
    already written."""
    path = os.path.join(ROOT, "tools", script)
    old_argv = sys.argv
    t0 = time.time()
    print(f"\n===== {script} {' '.join(argv)} =====", flush=True)
    try:
        sys.argv = [path] + argv
        runpy.run_path(path, run_name="__main__")
        print(f"===== {script} OK in {time.time() - t0:.0f}s =====",
              flush=True)
        return True
    except SystemExit as e:
        ok = (e.code in (0, None))
        print(f"===== {script} exit {e.code} in {time.time() - t0:.0f}s "
              "=====", flush=True)
        return ok
    except Exception as e:
        print(f"===== {script} FAILED: {type(e).__name__}: {e} =====",
              flush=True)
        return False
    finally:
        sys.argv = old_argv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=["gates", "probes", "all"])
    ap.add_argument("--seeds", default="3")
    ap.add_argument("--frames", default="32")
    args = ap.parse_args()

    # fail fast (60s) if the tunnel is actually dead
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    (x @ x).block_until_ready()
    print(f"[round4] TPU alive ({jax.devices()[0].platform}, "
          f"probe {time.time() - t0:.1f}s)", flush=True)

    results = {}
    if args.phase in ("gates", "all"):
        g = ["--seeds", args.seeds, "--frames", args.frames]
        for gate in ("serve_w42", "serve_w63", "serve_w82",
                     "inv_int8", "inv_cache_w3", "inv_cache_w4",
                     "inv_cache_w4_rev", "inv_int8_w3",
                     "chunk_ragged", "chunk_ragged_pad",
                     "local95", "global9", "serve_w42_m95",
                     "cfgcache_w2", "deepw4_cfgw2", "deepcache_w5"):
            results[f"gate:{gate}"] = run_tool(
                "quality_gate.py", ["--gate", gate] + g)
    if args.phase in ("probes", "all"):
        results["exp_resnet"] = run_tool("exp_resnet.py", [])
        results["exp_cache_serve"] = run_tool(
            "exp_cache.py", ["--frames", "8", "--steps", "10", "--int8"])

    print("\n[round4] summary:", flush=True)
    for k, ok in results.items():
        print(f"  {'OK ' if ok else 'FAIL'} {k}", flush=True)


if __name__ == "__main__":
    main()
