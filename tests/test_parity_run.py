"""CI for tools/parity_run.py on the tiny real-key-layout checkpoint —
the harness must be known-good before it ever sees real weights (the
BASELINE PSNR>=35 row fills itself the day a real SD checkpoint lands)."""

import importlib.util
import json
import os

import numpy as np
import pytest

from tests.helpers import make_tiny_bundle, make_tiny_video

pytestmark = pytest.mark.slow

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_parity():
    spec = importlib.util.spec_from_file_location(
        "parity_run", os.path.join(_ROOT, "tools", "parity_run.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def parity():
    return _load_parity()


def test_run_parity_tiny(parity, tmp_path):
    """Full harness flow on the tiny real-key-layout checkpoint: recon
    PSNR measured, edit produced, record written."""
    from tests.test_convert_golden import (build_tiny_unet_state,
                                           build_tiny_vae_state)
    from vidtome_tpu.models import convert

    bundle = make_tiny_bundle()
    bundle.unet_params = convert.convert_unet(dict(build_tiny_unet_state()))
    bundle.vae_params = convert.convert_vae(dict(build_tiny_vae_state()))
    bundle.vae_channels = ((8, 8), 1)

    clip = make_tiny_video(str(tmp_path / "clip"), n_frames=4, size=64)
    work = str(tmp_path / "work")
    record = parity.run_parity(bundle, work, clip, frames=4, steps=4,
                               size=64, edit_prompt="an oil painting",
                               inv_prompt="a colorful gradient")

    assert "inversion_recon_psnr_db" in record
    assert np.isfinite(record["inversion_recon_psnr_db"])
    assert record["edit_frames"] == 4
    assert record["random_weights"] is True

    saved = json.loads(
        open(os.path.join(work, "parity.json")).read())
    assert saved["inversion_recon_psnr_db"] == record[
        "inversion_recon_psnr_db"]
    # the ref-frames comparison path: score the edit against ITSELF —
    # must report a perfect gate pass (validates the --ref-frames flow)
    record2 = parity.run_parity(bundle, work, clip, frames=4, steps=4,
                                size=64, edit_prompt="an oil painting",
                                inv_prompt="a colorful gradient",
                                ref_frames=record["edit_output_dir"])
    assert record2["baseline_gate_35db"] is True


def test_ensure_clip_synthesizes(parity, tmp_path):
    clip = parity._ensure_clip(None, str(tmp_path), 4, 32)
    assert os.path.isdir(clip)
    assert len(os.listdir(clip)) == 4


def test_run_parity_profile_check(parity, tmp_path):
    """The --check-int8 path: profile edit rerun + PSNR vs its own bf16
    control-none baseline on the tiny checkpoint."""
    from tests.test_convert_golden import (build_tiny_unet_state,
                                           build_tiny_vae_state)
    from vidtome_tpu.models import convert

    bundle = make_tiny_bundle()
    bundle.unet_params = convert.convert_unet(dict(build_tiny_unet_state()))
    bundle.vae_params = convert.convert_vae(dict(build_tiny_vae_state()))
    bundle.vae_channels = ((8, 8), 1)

    clip = make_tiny_video(str(tmp_path / "clip"), n_frames=4, size=64)
    record = parity.run_parity(
        bundle, str(tmp_path / "work"), clip, frames=4, steps=4, size=64,
        edit_prompt="an oil painting", inv_prompt="a colorful gradient",
        check_profiles=("int8",))
    assert np.isfinite(record["profile_int8_psnr_db"])
    assert isinstance(record["profile_int8_gate_35db"], bool)


def test_run_parity_headline_serve_profile(parity, tmp_path):
    """--check-serve resolves to the SHIPPED headline profile (eps-skip
    included — the most proxy-sensitive lever) and runs end to end on the
    tiny checkpoint, so real weights can revalidate it in one command."""
    import importlib.util

    from tests.test_convert_golden import (build_tiny_unet_state,
                                           build_tiny_vae_state)
    from vidtome_tpu.models import convert

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_ROOT, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    headline = f"serve_{bench.DEFAULT_SERVE_PROFILE}"

    bundle = make_tiny_bundle()
    bundle.unet_params = convert.convert_unet(dict(build_tiny_unet_state()))
    bundle.vae_params = convert.convert_vae(dict(build_tiny_vae_state()))
    bundle.vae_channels = ((8, 8), 1)

    clip = make_tiny_video(str(tmp_path / "clip"), n_frames=4, size=64)
    record = parity.run_parity(
        bundle, str(tmp_path / "work"), clip, frames=4, steps=4, size=64,
        edit_prompt="an oil painting", inv_prompt="a colorful gradient",
        check_profiles=(headline,))
    assert np.isfinite(record[f"profile_{headline}_psnr_db"])
