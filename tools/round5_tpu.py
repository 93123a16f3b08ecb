"""Round-5 TPU measurement plan — ONE long-lived process.

Same tunnel-wedge policy as tools/round4_tpu.py: the tunneled v5e wedges
when processes churn, so every probe runs sequentially inside this single
process via runpy.  Run the moment the TPU revives:

    PYTHONPATH=/root/repo:/root/.axon_site \
        python tools/round5_tpu.py [--phase race|block|sdxl|all] 2>&1 \
        | tee /tmp/round5_tpu.log

Order (most valuable first, so a mid-run wedge still leaves artifacts):
  1. serve race    -> perf/serve_race_r5.json: bf16 deep-schedule profiles
                      (maxe2xb/maxe36b/maxe3xb, gated 37.61/37.57/35.18 dB)
                      vs the r4 champion maxe2x, + the two gated inversion
                      levers (cache_w3 35.91 dB, eps_w3x 35.25 dB)
  2. block dial    -> perf/serve_block_r5.json: winner profile at
                      steps_per_block 25 and 50 (numerics-neutral dispatch
                      granularity — no gate needed)
  3. SDXL stress   -> bench --sdxl 1024p row (BASELINE.md stress config,
                      never measured on TPU before round 5)
"""

from __future__ import annotations

import argparse
import os
import runpy
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_tool(relpath: str, argv: list[str]) -> bool:
    """Execute a tool's main() in-process (same TPU client — no process
    churn).  Never raises: a failing probe must not kill the artifacts
    already written."""
    path = os.path.join(ROOT, relpath)
    old_argv = sys.argv
    t0 = time.time()
    print(f"\n===== {relpath} {' '.join(argv)} =====", flush=True)
    try:
        sys.argv = [path] + argv
        runpy.run_path(path, run_name="__main__")
        print(f"===== {relpath} OK in {time.time() - t0:.0f}s =====",
              flush=True)
        return True
    except SystemExit as e:
        ok = (e.code in (0, None))
        print(f"===== {relpath} exit {e.code} in {time.time() - t0:.0f}s "
              "=====", flush=True)
        return ok
    except Exception as e:
        print(f"===== {relpath} FAILED: {type(e).__name__}: {e} =====",
              flush=True)
        return False
    finally:
        sys.argv = old_argv
        _release_device_memory()


def _release_device_memory():
    """Free every live device array between phases.  Phases are
    self-contained (each loads its own model), but a phase that dies
    mid-allocation (the r5 SDXL RESOURCE_EXHAUSTED) leaves its buffers
    referenced from the dead module/traceback and poisons every later
    phase with OOM — so drop caches, collect, and hard-delete whatever
    survives."""
    import gc

    import jax

    gc.collect()
    jax.clear_caches()
    gc.collect()
    n = 0
    for arr in jax.live_arrays():
        try:
            arr.delete()
            n += 1
        except Exception:
            pass
    if n:
        print(f"[round5] released {n} leaked device arrays", flush=True)


def run_tool_capture(relpath: str, argv: list[str], out_json: str) -> bool:
    """run_tool, but tee stdout and persist the tool's LAST stdout JSON
    line to `out_json` (bench.py prints its result as one JSON line and
    writes no artifact itself)."""
    import io
    import json

    class _Tee(io.TextIOBase):
        def __init__(self, *sinks):
            self.sinks = sinks
            self.lines: list[str] = []
            self._buf = ""

        def write(self, s):
            for k in self.sinks:
                k.write(s)
            self._buf += s
            while "\n" in self._buf:
                line, self._buf = self._buf.split("\n", 1)
                self.lines.append(line)
            return len(s)

        def flush(self):
            for k in self.sinks:
                k.flush()

    tee = _Tee(sys.stdout)
    old_stdout = sys.stdout
    sys.stdout = tee
    try:
        ok = run_tool(relpath, argv)
    finally:
        sys.stdout = old_stdout
    rec = None
    for line in reversed(tee.lines + [tee._buf]):
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
                break
            except ValueError:
                continue
    if rec is not None:
        with open(out_json, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"[round5] wrote {out_json}", flush=True)
    else:
        print(f"[round5] NO JSON captured for {out_json}", flush=True)
        ok = False
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    help="comma list of race|block|sdxl|bench|stepkinds, "
                         "or 'all' (= race,block,sdxl)")
    ap.add_argument("--winner", default="maxe3xb",
                    help="profile the block-dial phase races (the deepest "
                         "gated bf16 schedule unless the race says "
                         "otherwise)")
    args = ap.parse_args()

    # fail fast (60s) if the tunnel is actually dead
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    (x @ x).block_until_ready()
    print(f"[round5] TPU alive ({jax.devices()[0].platform}, "
          f"probe {time.time() - t0:.1f}s)", flush=True)

    results = {}
    phases = set(args.phase.split(",")) if args.phase != "all" else {"race", "block", "sdxl"}
    if "race" in phases:
        results["serve_race"] = run_tool(
            "tools/exp_serve_race.py",
            ["--profiles", "maxe2x,maxe2xb,maxe36b,maxe3xb",
             "--inv-profiles", "cache_w3,eps_w3x",
             "--out", os.path.join(ROOT, "perf", "serve_race_r5.json")])
    if "block" in phases:
        for block in (25, 50):
            results[f"block{block}"] = run_tool(
                "tools/exp_serve_race.py",
                ["--profiles", args.winner, "--block", str(block),
                 "--skip-exact", "--skip-inv",
                 "--out", os.path.join(ROOT, "perf",
                                       f"serve_block{block}_r5.json")])
    if "bench" in phases:
        # full default bench run: validates the promoted defaults
        # (maxe3xb + eps_w3x) through bench's own path and captures the
        # serve_end_to_end / pnp / int8 sidecar numbers in one artifact
        results["bench"] = run_tool_capture(
            "bench.py", [],
            os.path.join(ROOT, "perf", "bench_headline_r5.json"))
    if "resnet" in phases:
        # external-shortcut kernel sweep over every SD1.5 shape class
        # (projection shapes lost 0.94x/0.68x with the old in-kernel
        # shortcut; this measures the new routing frontier)
        results["resnet"] = run_tool(
            "tools/exp_resnet.py",
            ["--full", "--out",
             os.path.join(ROOT, "perf", "resnet_sweep_r5.json")])
    if "cgates" in phases:
        # chunk-size push gates: standalone levers + maxe3xb-combined
        results["cgates"] = run_tool(
            "tools/quality_gate.py",
            ["--gate",
             "chunk8,chunk16,serve_maxe3xbc8,serve_maxe3xbc16"])
    if "crace" in phases:
        results["crace"] = run_tool(
            "tools/exp_serve_race.py",
            ["--profiles", "maxe3xb,maxe3xbc8,maxe3xbc16",
             "--skip-exact", "--skip-inv",
             "--out", os.path.join(ROOT, "perf", "serve_race_r5c.json")])
    if "xlgate" in phases:
        # gate the shipped serve profile at SDXL 1024p (8 frames bounds
        # the exact-side cost; artifact gates/serve_<winner>_xl.json)
        results["xlgate"] = run_tool(
            "tools/quality_gate.py",
            ["--sd", "xl", "--gate", f"serve_{args.winner}",
             "--frames", "8", "--size", "1024"])
    if "sdxl" in phases:
        results["sdxl"] = run_tool_capture(
            "bench.py", ["--sdxl"],
            os.path.join(ROOT, "perf", "sdxl_r5.json"))
    if "qgates" in phases:
        # quadratic eps-skip predictor frontier: order-2 dB delta at the
        # shipped cadence (maxe3xb2), the deeper w4 cadences it might
        # unlock (maxe4xb2 / maxe4xb2c6), and the piecewise w3->w4
        # cadence (maxe34xb2); inversion-side w3/w4 quads
        results["qgates"] = run_tool(
            "tools/quality_gate.py",
            ["--gate",
             "serve_maxe3xb2,serve_maxe4xb2,serve_maxe4xb2c6,"
             "serve_maxe34xb2"])
        results["qgates_inv"] = run_tool(
            "tools/quality_gate.py",
            ["--gate", "inv_eps_w3x2,inv_eps_w4x2"])
    if "qrace" in phases:
        results["qrace"] = run_tool(
            "tools/exp_serve_race.py",
            ["--profiles", "maxe3xb,maxe4xb2,maxe4xb2c6,maxe34xb2",
             "--inv-profiles", "eps_w3x,eps_w4x2",
             "--skip-exact",
             "--out", os.path.join(ROOT, "perf", "serve_race_r5q.json")])
    if "srace" in phases:
        # fused cross-attention sublayer kernel: in-graph win or loss
        # (§8.1/§8.3 both looked good on paper and measured worse — only
        # the race decides)
        results["srace"] = run_tool(
            "tools/exp_serve_race.py",
            ["--profiles", "maxe3xb,maxe3xbs",
             "--skip-exact", "--skip-inv",
             "--out", os.path.join(ROOT, "perf", "serve_race_r5s.json")])
    if "tracefull" in phases:
        # full per-family artifact incl. skipped async-DMA totals: the
        # 472ms full-step wall vs ~334ms of counted ops leaves ~138ms
        # unattributed — find out whether it is unoverlapped DMA,
        # gather/scatter families below the old top-8, or dispatch gaps
        for blk in (0, 1):
            results[f"tracefull{blk}"] = run_tool(
                "tools/trace_ops.py",
                [f"--profile={args.winner}", f"--block={blk}",
                 f"--out={os.path.join(ROOT, 'perf', f'trace_{args.winner}_b{blk}_full_r5.json')}"])
    if "trace0" in phases:
        # op-level trace of the WARMUP block (all-full steps = 69% of the
        # maxe3xb serve wall): what a 472ms full step is made of
        results["trace0"] = run_tool(
            "tools/trace_ops.py",
            [f"--profile={args.winner}", "--block=0"])
    if "trace1" in phases:
        results["trace1"] = run_tool(
            "tools/trace_ops.py", [f"--profile={args.winner}"])
    if "stepkinds" in phases:
        # per-step-kind decomposition under the PROMOTED bf16 profile
        # (the r5 artifact was measured under int8 maxe2x) — guides the
        # remaining kernel levers
        results["stepkinds"] = run_tool(
            "tools/exp_stepkinds.py",
            ["--profile", args.winner,
             "--out", os.path.join(ROOT, "perf",
                                   f"stepkinds_{args.winner}_r5.json")])

    print("\n[round5] summary:", flush=True)
    for k, ok in results.items():
        print(f"  {'OK ' if ok else 'FAIL'} {k}", flush=True)


if __name__ == "__main__":
    main()
