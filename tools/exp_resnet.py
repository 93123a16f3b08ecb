"""Probe: fused resnet Pallas kernel vs the XLA composition, in-graph.

Scan loops with n >= 300 iterations (tunnel dispatch ~20ms would
otherwise swamp per-op cost — see docs/DESIGN.md §8 method notes);
checks numerical agreement once per shape first.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_resnet.py
"""

from __future__ import annotations

import time

from vidtome_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vidtome_tpu.ops.resnet import fused_resnet

N_ITERS = 300


def xla_resnet(x, tvec, n1s, n1b, w1, b1, n2s, n2b, w2, b2, ws=None,
               bs=None, groups=32, eps=1e-5):
    """The exact op sequence ResnetBlock2D emits on the XLA path."""
    def gn_silu(v, s, bvec):
        B, H, W, C = v.shape
        vf = v.astype(jnp.float32).reshape(B, H * W, groups, C // groups)
        mean = vf.mean(axis=(1, 3), keepdims=True)
        var = vf.var(axis=(1, 3), keepdims=True)
        y = (vf - mean) * jax.lax.rsqrt(var + eps)
        y = y.reshape(B, H, W, C) * s + bvec
        y = y * jax.nn.sigmoid(y)
        return y.astype(v.dtype)

    def conv3(v, w):
        dn = jax.lax.conv_dimension_numbers(v.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            v, w.astype(v.dtype), (1, 1), "SAME", dimension_numbers=dn)

    h = gn_silu(x, n1s, n1b)
    h = conv3(h, w1) + (b1 + tvec)[:, None, None, :].astype(x.dtype)
    h = gn_silu(h, n2s, n2b)
    h = conv3(h, w2) + b2.astype(x.dtype)
    sc = (x if ws is None
          else jnp.dot(x, ws.astype(x.dtype)) + bs.astype(x.dtype))
    return sc + h


def make(key, B, H, W, Ci, Co, proj):
    ks = jax.random.split(key, 12)
    p = dict(
        x=jax.random.normal(ks[0], (B, H, W, Ci), jnp.bfloat16),
        tvec=0.3 * jax.random.normal(ks[1], (B, Co), jnp.float32),
        n1s=1.0 + 0.2 * jax.random.normal(ks[2], (Ci,), jnp.float32),
        n1b=0.1 * jax.random.normal(ks[3], (Ci,), jnp.float32),
        w1=0.15 * jax.random.normal(ks[4], (3, 3, Ci, Co), jnp.float32),
        b1=0.1 * jax.random.normal(ks[5], (Co,), jnp.float32),
        n2s=1.0 + 0.2 * jax.random.normal(ks[6], (Co,), jnp.float32),
        n2b=0.1 * jax.random.normal(ks[7], (Co,), jnp.float32),
        w2=0.15 * jax.random.normal(ks[8], (3, 3, Co, Co), jnp.float32),
        b2=0.1 * jax.random.normal(ks[9], (Co,), jnp.float32),
        ws=(0.3 * jax.random.normal(ks[10], (Ci, Co), jnp.float32)
            if proj else None),
        bs=(0.1 * jax.random.normal(ks[11], (Co,), jnp.float32)
            if proj else None),
    )
    return p


def timed(fn, p):
    """Scan fn over N_ITERS feedback iterations; return ms/iter."""
    args = (p["tvec"], p["n1s"], p["n1b"], p["w1"], p["b1"], p["n2s"],
            p["n2b"], p["w2"], p["b2"])
    extra = () if p["ws"] is None else (p["ws"], p["bs"])

    @jax.jit
    def loop(x0):
        def body(x, _):
            y = fn(x, *args, *extra)
            # feed back at the input arity (channel tile / slice)
            Ci = x.shape[-1]
            if y.shape[-1] != Ci:
                reps = -(-Ci // y.shape[-1])
                y = jnp.concatenate([y] * reps, axis=-1)[..., :Ci]
            return y.astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x0, None, length=N_ITERS)
        return y

    y = loop(p["x"])  # compile + warm
    _ = float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.time()
    y = loop(p["x"])
    _ = float(jnp.sum(y.astype(jnp.float32)))
    return (time.time() - t0) / N_ITERS * 1e3


def xla_resnet_int8(x, tvec, n1s, n1b, w1, b1, n2s, n2b, w2, b2, ws=None,
                    bs=None, groups=32, eps=1e-5):
    """The op sequence the W8A8 serving path emits (QConv int8 +
    static activation scales), for the same-scheme comparison."""
    from vidtome_tpu.ops.quant import static_act_scale

    def gn_silu(v, s, bvec):
        B, H, W, C = v.shape
        vf = v.astype(jnp.float32).reshape(B, H * W, groups, C // groups)
        mean = vf.mean(axis=(1, 3), keepdims=True)
        var = vf.var(axis=(1, 3), keepdims=True)
        y = (vf - mean) * jax.lax.rsqrt(var + eps)
        y = y.reshape(B, H, W, C) * s + bvec
        y = y * jax.nn.sigmoid(y)
        return y.astype(v.dtype)

    def q_conv3(y, ns, nb, wq, sw):
        sx = static_act_scale(ns, nb)
        q = jnp.clip(jnp.round(y.astype(jnp.float32) / sx), -127,
                     127).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(q.shape, wq.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        r = jax.lax.conv_general_dilated(
            q, wq, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return r.astype(jnp.float32) * (sx * sw)

    h = gn_silu(x, n1s, n1b)
    h = q_conv3(h, n1s, n1b, w1[0], w1[1]) \
        + (b1 + tvec)[:, None, None, :]
    h = gn_silu(h.astype(jnp.bfloat16), n2s, n2b)
    h = q_conv3(h, n2s, n2b, w2[0], w2[1]) + b2
    sc = (x.astype(jnp.float32) if ws is None
          else jnp.dot(x, ws.astype(x.dtype)).astype(jnp.float32) + bs)
    return (sc + h).astype(jnp.bfloat16)


def main():
    import argparse
    import json
    import os

    from vidtome_tpu.ops.quant import quantize_weight

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write {label: {xla_ms, fused_ms, ratio, "
                         "maxerr}} JSON artifact here")
    ap.add_argument("--int8", action="store_true",
                    help="also time the W8A8 variants (int8 was dropped "
                         "from the serve profiles in round 5, so the "
                         "default sweep is bf16-only)")
    ap.add_argument("--full", action="store_true",
                    help="sweep EVERY distinct SD1.5 (Ci,Co,rows) resnet "
                         "shape class incl. all up-path projection "
                         "shapes and the chunk-8 batch-16 variants "
                         "(default: the 4 round-3 shapes)")
    args = ap.parse_args()

    shapes = [
        ("L0 down 320->320", dict(B=8, H=64, W=64, Ci=320, Co=320,
                                  proj=False), 32),
        ("L0 up   640->320", dict(B=8, H=64, W=64, Ci=640, Co=320,
                                  proj=True), 32),
        ("L1 down 640->640", dict(B=8, H=32, W=32, Ci=640, Co=640,
                                  proj=False), 32),
        ("L1 up  1280->640", dict(B=8, H=32, W=32, Ci=1280, Co=640,
                                  proj=True), 32),
    ]
    if args.full:
        # every remaining distinct (Ci, Co, rows) class the SD1.5 UNet
        # executes at 512p on the merge-eligible levels (models/unet.py
        # block channel arithmetic: up-path Ci = hidden + skip), plus
        # batch-16 variants for the chunk-8 serve candidate
        shapes += [
            ("L0 up   960->320", dict(B=8, H=64, W=64, Ci=960, Co=320,
                                      proj=True), 32),
            ("L1 down 320->640", dict(B=8, H=32, W=32, Ci=320, Co=640,
                                      proj=True), 32),
            ("L1 up   960->640", dict(B=8, H=32, W=32, Ci=960, Co=640,
                                      proj=True), 32),
            ("L1 up  1920->640", dict(B=8, H=32, W=32, Ci=1920, Co=640,
                                      proj=True), 32),
            ("L0 down 320->320 b16", dict(B=16, H=64, W=64, Ci=320,
                                          Co=320, proj=False), 32),
            ("L0 up   640->320 b16", dict(B=16, H=64, W=64, Ci=640,
                                          Co=320, proj=True), 32),
            ("L1 down 640->640 b16", dict(B=16, H=32, W=32, Ci=640,
                                          Co=640, proj=False), 32),
            ("L1 up  1280->640 b16", dict(B=16, H=32, W=32, Ci=1280,
                                          Co=640, proj=True), 32),
        ]
    rows_out = {}
    for label, spec, groups in shapes:
        p = make(jax.random.key(0), **spec)
        extra = () if p["ws"] is None else (p["ws"], p["bs"])
        fargs = (p["x"], p["tvec"], p["n1s"], p["n1b"], p["w1"], p["b1"],
                 p["n2s"], p["n2b"], p["w2"], p["b2"], *extra)
        want = np.asarray(xla_resnet(*fargs, groups=groups), np.float32)
        got = np.asarray(fused_resnet(*fargs, num_groups=groups),
                         np.float32)
        scale = np.abs(want).max() + 1e-3
        err = np.abs(got / scale - want / scale).max()
        ms_xla = timed(lambda *a: xla_resnet(*a, groups=groups), p)
        ms_fus = timed(lambda *a: fused_resnet(*a, num_groups=groups), p)
        print(f"{label}:  xla {ms_xla:7.3f}ms  fused {ms_fus:7.3f}ms  "
              f"({ms_xla / ms_fus:4.2f}x)  maxerr {err:.4f}", flush=True)
        rows_out[label] = {
            "xla_ms": round(ms_xla, 3), "fused_ms": round(ms_fus, 3),
            "ratio": round(ms_xla / ms_fus, 3),
            "maxerr": round(float(err), 5),
        }
        if args.out:  # write incrementally — a tunnel stall mid-sweep
            _write_artifact(args.out, rows_out)  # must not lose the rows

        if not args.int8:
            continue
        # --- int8 serving variants of the same block ---
        w1q = quantize_weight(p["w1"])
        w2q = quantize_weight(p["w2"])
        pq = dict(p, w1=w1q, w2=w2q)

        def fused_q(x, tvec, n1s, n1b, w1, b1, n2s, n2b, w2, b2,
                    ws=None, bs=None):
            return fused_resnet(x, tvec, n1s, n1b, w1[0], b1, n2s, n2b,
                                w2[0], b2, ws, bs, w1[1], w2[1],
                                num_groups=groups, quant=True)

        ms_xq = timed(lambda *a: xla_resnet_int8(*a, groups=groups), pq)
        ms_fq = timed(fused_q, pq)
        print(f"{label} [int8]:  xla {ms_xq:7.3f}ms  fused "
              f"{ms_fq:7.3f}ms  ({ms_xq / ms_fq:4.2f}x)", flush=True)
        rows_out[label + " [int8]"] = {
            "xla_ms": round(ms_xq, 3), "fused_ms": round(ms_fq, 3),
            "ratio": round(ms_xq / ms_fq, 3),
        }

    if args.out:
        _write_artifact(args.out, rows_out)
        print(json.dumps({"wrote": os.path.abspath(args.out)}))


def _write_artifact(path, rows_out):
    import json

    import jax

    rec = {"backend": jax.default_backend(), "n_iters": N_ITERS,
           "kernel": "external-shortcut (round 5)",
           "shapes": rows_out,
           "scope": "ms per block forward, 300-iter scan loop, warm"}
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
