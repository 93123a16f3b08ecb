"""Config system: base-config chains, interpolation, prompt normalization,
stage snapshots (parity with reference utils/config_utils.py:5-40)."""

import os

import yaml

from vidtome_tpu.config import (Config, load_config_file, merge_configs,
                                save_config)


def _write(tmp_path, name, data):
    p = os.path.join(tmp_path, name)
    with open(p, "w") as f:
        yaml.safe_dump(data, f)
    return p


def test_deep_merge_child_wins(tmp_path):
    base = _write(tmp_path, "base.yaml", {
        "a": 1, "nested": {"x": 1, "y": 2}, "seed": 123})
    leaf = _write(tmp_path, "leaf.yaml", {
        "base_config": base, "nested": {"y": 99, "z": 3}})
    cfg = load_config_file(leaf)
    assert cfg.a == 1
    assert cfg.nested.x == 1
    assert cfg.nested.y == 99
    assert cfg.nested.z == 3
    assert cfg.seed == 123


def test_chained_base_configs(tmp_path):
    root = _write(tmp_path, "root.yaml", {"lvl": "root", "only_root": True})
    mid = _write(tmp_path, "mid.yaml", {"base_config": root, "lvl": "mid"})
    leaf = _write(tmp_path, "leaf.yaml", {"base_config": mid, "lvl": "leaf"})
    cfg = load_config_file(leaf)
    assert cfg.lvl == "leaf"
    assert cfg.only_root is True


def test_interpolation(tmp_path):
    leaf = _write(tmp_path, "c.yaml", {
        "work_dir": "/out/run1",
        "generation": {"latents_path": "${work_dir}/latents",
                       "output_path": "${work_dir}"},
    })
    cfg = load_config_file(leaf)
    assert cfg.generation.latents_path == "/out/run1/latents"
    assert cfg.generation.output_path == "/out/run1"


def test_prompt_normalization(tmp_path):
    leaf = _write(tmp_path, "p.yaml", {
        "generation": {"prompt": "a cat, Van Gogh style"}})
    cfg = load_config_file(leaf)
    assert cfg.generation.prompt == {"edit": "a cat, Van Gogh style"}
    # dict prompts pass through
    leaf2 = _write(tmp_path, "p2.yaml", {
        "generation": {"prompt": {"vg": "x", "desert": "y"}}})
    cfg2 = load_config_file(leaf2)
    assert dict(cfg2.generation.prompt) == {"vg": "x", "desert": "y"}


def test_save_config_drops_other_stage(tmp_path):
    cfg = Config({"inversion": {"steps": 50}, "generation": {"n_timesteps": 50},
                  "seed": 1})
    gene_dir = os.path.join(tmp_path, "gene")
    save_config(cfg, gene_dir, gene=True)
    with open(os.path.join(gene_dir, "config.yaml")) as f:
        snap = yaml.safe_load(f)
    assert "inversion" not in snap and "generation" in snap
    # original untouched
    assert "inversion" in cfg

    inv_dir = os.path.join(tmp_path, "inv")
    save_config(cfg, inv_dir, inv=True)
    with open(os.path.join(inv_dir, "config.yaml")) as f:
        snap = yaml.safe_load(f)
    assert "generation" not in snap and "inversion" in snap


def test_merge_configs_pure():
    a = {"x": {"y": 1}}
    b = {"x": {"z": 2}}
    out = merge_configs(a, b)
    assert out.x.y == 1 and out.x.z == 2
    assert "z" not in a["x"]


def test_repo_default_config_loads():
    cfg = load_config_file("configs/tea-pour.yaml")
    assert cfg.sd_version == "1.5"
    assert cfg.generation.chunk_size == 4
    assert cfg.inversion.save_path.endswith("/latents")


def test_all_shipped_configs_load():
    """Every worked-example config must inherit the default surface and
    resolve cleanly (the reference ships the same four examples)."""
    import glob

    for path in sorted(glob.glob("configs/*.yaml")):
        cfg = load_config_file(path)
        assert "generation" in cfg and "inversion" in cfg, path
        prompt = cfg.generation.prompt
        assert prompt is None or isinstance(prompt, dict), path
        assert cfg.generation.latents_path == cfg.inversion.save_path, path
        assert 0 < cfg.generation.local_merge_ratio <= 1.0, path
