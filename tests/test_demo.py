"""Out-of-the-box demo: bundled clip + configs/demo.yaml run through the
real CLI entry points (combined and per-stage), on a tiny model so the
smoke test stays CPU-fast.  Mirrors the reference's ship-sample-data
experience (data/*.mp4 + configs/tea-pour.yaml)."""

import os

import pytest
import yaml

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO_CLIP = os.path.join(REPO, "data", "demo.mp4")
DEMO_CONFIG = os.path.join(REPO, "configs", "demo.yaml")


def test_demo_assets_ship():
    assert os.path.exists(DEMO_CLIP), "bundled demo clip missing"
    assert os.path.exists(DEMO_CONFIG)

    from vidtome_tpu.config import load_config_file

    cfg = load_config_file(DEMO_CONFIG)
    assert cfg.input_path == "data/demo.mp4"
    assert cfg.generation.control == "none"  # runs without extra weights


def test_demo_clip_decodes():
    from vidtome_tpu.io.video import load_video

    frames = load_video(DEMO_CLIP, 512, 512)
    assert frames.shape == (16, 512, 512, 3)
    # real temporal structure (merging has something to do): consecutive
    # AND distant frames must differ measurably
    assert float(((frames[1] - frames[0]) ** 2).mean()) > 1e-5
    assert float(((frames[-1] - frames[0]) ** 2).mean()) > 1e-4


@pytest.fixture()
def tiny_demo_config(tmp_path):
    """Demo config shrunk for CPU: tiny model, 64p, 2 steps, 8 frames."""
    override = {
        "base_config": DEMO_CONFIG,
        "sd_version": "tiny",
        "work_dir": str(tmp_path / "work"),
        "height": 64,
        "width": 64,
        "float_precision": "fp32",
        "inversion": {"steps": 2, "save_steps": 2, "batch_size": 4},
        "generation": {"n_timesteps": 2, "frame_range": [0, 8, 1],
                       "align_batch": False, "save_frame": False},
    }
    path = tmp_path / "demo_tiny.yaml"
    path.write_text(yaml.safe_dump(override))
    return str(path)


def test_demo_cli_end_to_end(tiny_demo_config, monkeypatch):
    monkeypatch.chdir(REPO)  # demo config paths are repo-relative
    from vidtome_tpu import cli

    cli.main(["--config", tiny_demo_config])
    cfg_dir = yaml.safe_load(open(tiny_demo_config))["work_dir"]
    out = os.path.join(cfg_dir, "watercolor", "output.mp4")
    assert os.path.exists(out), "demo edit did not produce an output video"


def test_demo_standalone_stages(tiny_demo_config, monkeypatch, tmp_path):
    monkeypatch.chdir(REPO)
    from vidtome_tpu.pipeline import generator, inverter

    # re-point work_dir so this test does not reuse the combined run's cache
    override = yaml.safe_load(open(tiny_demo_config))
    override["work_dir"] = str(tmp_path / "stagework")
    path = tmp_path / "demo_stages.yaml"
    path.write_text(yaml.safe_dump(override))

    inverter.main(["--config", str(path)])
    latents_root = os.path.join(override["work_dir"], "latents")
    assert os.path.isdir(latents_root)

    generator.main(["--config", str(path)])
    out = os.path.join(override["work_dir"], "watercolor", "output.mp4")
    assert os.path.exists(out)


@pytest.mark.parametrize("name,control", [
    ("demo-canny.yaml", "canny"),
    ("demo-depth.yaml", "depth"),
    ("demo-pnp.yaml", "pnp"),
])
def test_control_demo_configs_load(name, control, monkeypatch):
    """Every control family ships a zero-setup entry point (reference
    ships 4 worked configs, /root/reference/configs/*.yaml)."""
    monkeypatch.chdir(REPO)
    from vidtome_tpu.config import load_config_file

    cfg = load_config_file(os.path.join(REPO, "configs", name))
    assert cfg.generation.control == control
    assert cfg.input_path == "data/demo.mp4"
    assert os.path.exists(cfg.input_path)
    if control == "pnp":
        assert cfg.inversion.save_intermediate  # PnP needs every timestep


def test_demo_canny_cli_end_to_end(tmp_path, monkeypatch):
    """demo-canny through the real CLI on the tiny stack: exercises the
    canny preprocessing cache + the random-init ControlNet fallback."""
    monkeypatch.chdir(REPO)
    from vidtome_tpu import cli

    override = {
        "base_config": os.path.join(REPO, "configs", "demo-canny.yaml"),
        "sd_version": "tiny",
        "work_dir": str(tmp_path / "work"),
        "height": 64,
        "width": 64,
        "float_precision": "fp32",
        "inversion": {"steps": 2, "save_steps": 2, "batch_size": 4},
        "generation": {"n_timesteps": 2, "frame_range": [0, 8, 1],
                       "align_batch": False, "save_frame": False},
    }
    path = tmp_path / "demo_canny_tiny.yaml"
    path.write_text(yaml.safe_dump(override))
    cli.main(["--config", str(path)])
    out = os.path.join(override["work_dir"], "lineart", "output.mp4")
    assert os.path.exists(out)
    assert os.path.isdir(os.path.join(override["work_dir"], "canny_image"))
