"""Harness-level checks for tools/quality_gate.py — the gate MEASUREMENTS
run on TPU with the full model; these tests validate the plumbing (config
assembly, inversion-joint harness flow, artifact writing) on the tiny
bundle so a broken harness never burns a TPU session."""

import importlib.util
import json
import os
import types

import numpy as np
import pytest

from tests.helpers import make_tiny_bundle

pytestmark = pytest.mark.slow

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_qgate():
    spec = importlib.util.spec_from_file_location(
        "quality_gate", os.path.join(_ROOT, "tools", "quality_gate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def qgate():
    return _load_qgate()


def test_make_clip_deterministic(qgate):
    a = qgate.make_clip(4, 32, seed=1)
    b = qgate.make_clip(4, 32, seed=1)
    c = qgate.make_clip(4, 32, seed=2)
    assert a.shape == (4, 32, 32, 3)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.min() >= 0 and a.max() <= 1


def test_inv_gate_joint_harness_tiny(qgate, tmp_path, monkeypatch):
    """run_inv_gate end-to-end on the tiny bundle: identical inverter
    configs must give ~infinite PSNR; a real lever gives a finite one."""
    monkeypatch.chdir(tmp_path)
    bundle = make_tiny_bundle()
    args = types.SimpleNamespace(seeds=1, frames=4, steps=2, size=64)

    # identity gate: exact == fast -> the joint harness must report the
    # sentinel 99 dB (bitwise-equal generations)
    qgate.INV_GATES["__identity__"] = ({}, {})
    try:
        vals = qgate.run_inv_gate(bundle, "__identity__", args, {})
    finally:
        del qgate.INV_GATES["__identity__"]
    assert vals == [99.0]


def test_inv_gate_cache_lever_changes_output(qgate, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    bundle = make_tiny_bundle()
    args = types.SimpleNamespace(seeds=1, frames=4, steps=4, size=64)
    vals = qgate.run_inv_gate(bundle, "inv_cache2", args, {})
    assert len(vals) == 1
    assert 0 < vals[0] < 99.0  # finite: the lever changed the output


def test_gen_gate_harness_tiny(qgate, monkeypatch):
    """run_gen_gate on the tiny bundle: an identity gate must report the
    99 dB sentinel (both sides reuse one Generator config), and a real
    lever must report a finite PSNR."""
    bundle = make_tiny_bundle()
    args = types.SimpleNamespace(seeds=1, frames=4, steps=2, size=64)
    monkeypatch.setitem(qgate.GATES, "__identity__", ({}, {}))
    n_frames, vals = qgate.run_gen_gate(bundle, "__identity__", args)
    assert n_frames == 4
    assert vals == [99.0]
    n_frames, vals = qgate.run_gen_gate(bundle, "int8", args)
    assert len(vals) == 1
    assert 0 < vals[0] < 99.0


def test_gen_gate_sd_version_plumbing(qgate):
    """--sd threads through run_gen_gate -> make_config (the SDXL gate
    path, measured on TPU via --sd xl): the harness must build the
    bundle's own model family and still produce a finite PSNR."""
    bundle = make_tiny_bundle()
    args = types.SimpleNamespace(seeds=1, frames=4, steps=2, size=64,
                                 sd="tiny")
    _, vals = qgate.run_gen_gate(bundle, "int8", args)
    assert len(vals) == 1 and 0 < vals[0] < 99.0
    cfg = qgate.make_config(4, 2, 64, 123, sd_version="xl")
    assert cfg["sd_version"] == "xl"
    assert cfg["generation"]["batch_size"] == 2  # 1024p decode HBM rule


def test_gen_gate_exact_cache_shared_across_gates(qgate, monkeypatch):
    """Gates sharing the same exact config must reuse the cached exact-side
    frames: the second gate's PSNR is unchanged by the cache, and the cache
    holds one entry per (exact-config, n_frames, seed)."""
    bundle = make_tiny_bundle()
    args = types.SimpleNamespace(seeds=1, frames=4, steps=2, size=64)
    cache = {}
    _, vals_a = qgate.run_gen_gate(bundle, "int8", args, cache)
    assert len(cache) == 1  # exact side computed once
    _, vals_b = qgate.run_gen_gate(bundle, "int8", args, cache)
    assert len(cache) == 1  # second gate hit the cache
    assert vals_a == vals_b  # cached exact side gives identical PSNR


def test_gate_artifact_written(qgate, tmp_path):
    rec = {"gate": "unit_test_gate", "psnr_mean_db": 42.0}
    qgate._write_gate_artifact("unit_test_gate", rec,
                               gates_dir=str(tmp_path / "gates"))
    path = tmp_path / "gates" / "unit_test_gate.json"
    assert path.exists()
    data = json.loads(path.read_text())
    assert data["psnr_mean_db"] == 42.0
    assert "backend" in data and "timestamp" in data
