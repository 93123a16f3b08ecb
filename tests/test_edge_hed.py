"""Native Flax HED edge network vs a torch oracle of the ControlNetHED
checkpoint architecture (role of controlnet_aux softedge models,
reference utils/controlnet_utils.py:28-60)."""

import numpy as np
import pytest

from vidtome_tpu.control import edge_hed

torch = pytest.importorskip("torch")


def _torch_hed_state_dict(seed=0):
    """Random-weight state dict with the real ControlNetHED key layout and
    shapes."""
    g = torch.Generator().manual_seed(seed)
    sd = {"norm": torch.randn((1, 3, 1, 1), generator=g) * 50}
    specs = [("block1", 3, 64, 2), ("block2", 64, 128, 2),
             ("block3", 128, 256, 3), ("block4", 256, 512, 3),
             ("block5", 512, 512, 3)]
    for name, cin, cout, layers in specs:
        ci = cin
        for i in range(layers):
            sd[f"{name}.convs.{i}.weight"] = (
                torch.randn((cout, ci, 3, 3), generator=g) * 0.05)
            sd[f"{name}.convs.{i}.bias"] = (
                torch.randn((cout,), generator=g) * 0.05)
            ci = cout
        sd[f"{name}.projection.weight"] = (
            torch.randn((1, cout, 1, 1), generator=g) * 0.05)
        sd[f"{name}.projection.bias"] = torch.randn((1,), generator=g) * 0.05
    return sd


def _torch_forward(sd, x_nchw):
    """Oracle forward of the ControlNetHED architecture: 3x3 conv + ReLU
    stacks with maxpool-2 between blocks, 1x1 side projections."""
    import torch.nn.functional as F

    h = x_nchw - sd["norm"]
    sides = []
    for bi, (name, layers) in enumerate(
            [("block1", 2), ("block2", 2), ("block3", 3), ("block4", 3),
             ("block5", 3)]):
        if bi > 0:
            h = F.max_pool2d(h, 2, 2)
        for i in range(layers):
            h = F.relu(F.conv2d(h, sd[f"{name}.convs.{i}.weight"],
                                sd[f"{name}.convs.{i}.bias"], padding=1))
        sides.append(F.conv2d(h, sd[f"{name}.projection.weight"],
                              sd[f"{name}.projection.bias"]))
    return sides


class TestHEDParity:
    def test_converted_forward_matches_torch(self):
        sd = _torch_hed_state_dict()
        x = torch.rand((1, 3, 32, 32), generator=torch.Generator()
                       .manual_seed(1)) * 255.0
        with torch.no_grad():
            want = _torch_forward(sd, x)

        params = edge_hed.convert_hed_state_dict(
            {k: v.numpy() for k, v in sd.items()})
        model = edge_hed._build_model()
        got = model.apply({"params": params},
                          np.transpose(x.numpy(), (0, 2, 3, 1)))
        assert len(got) == 5
        for w, g in zip(want, got):
            np.testing.assert_allclose(
                np.asarray(g)[..., 0], w.numpy()[:, 0], atol=2e-3, rtol=1e-3)

    def test_hed_edges_end_to_end(self, tmp_path, monkeypatch):
        sd = _torch_hed_state_dict()
        ckpt = tmp_path / "ControlNetHED.pth"
        torch.save(sd, ckpt)
        imgs = np.random.default_rng(0).random((2, 40, 48, 3)).astype(
            np.float32)
        out = edge_hed.hed_edges(imgs, str(ckpt), safe=True)
        assert out.shape == (2, 40, 48, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0
        # safe quantization: only multiples of 1/step appear
        vals = np.unique(np.round(out * 2))
        assert len(vals) <= 3

    def test_softedge_uses_hed_when_model_set(self, tmp_path, monkeypatch):
        from vidtome_tpu.control.preprocess import softedge_preprocess

        torch.save(_torch_hed_state_dict(), tmp_path / "hed.pth")
        monkeypatch.setenv("VIDTOME_HED_MODEL", str(tmp_path / "hed.pth"))
        imgs = np.random.default_rng(1).random((1, 32, 32, 3)).astype(
            np.float32)
        out = softedge_preprocess(imgs)
        assert out.shape == (1, 32, 32, 3)
        # the pidsafe default applies safe_step quantization
        assert len(np.unique(np.round(out * 2))) <= 3


class TestSafeStep:
    def test_quantizes_to_steps(self):
        x = np.asarray([0.0, 0.2, 0.4, 0.6, 0.8, 1.0])
        y = edge_hed.safe_step(x, step=2)
        assert set(np.unique(y)) <= {0.0, 0.5, 1.0}

    def test_monotone(self):
        x = np.linspace(0, 1, 101)
        y = edge_hed.safe_step(x)
        assert (np.diff(y) >= 0).all()


class TestOpenposeEarlyValidation:
    @pytest.mark.slow
    def test_openpose_fails_at_pipeline_construction(self, tmp_path):
        from tests.helpers import make_tiny_bundle
        from tests.test_pipeline_e2e import _base_config
        from vidtome_tpu.pipeline.inverter import Inverter

        bundle = make_tiny_bundle()
        cfg = _base_config(str(tmp_path), str(tmp_path / "nope.mp4"))
        cfg["inversion"]["control"] = "openpose"
        with pytest.raises(RuntimeError, match="openpose"):
            Inverter(bundle, cfg)

    def test_other_controls_pass_validation(self):
        from vidtome_tpu.control.preprocess import validate_control_available

        for c in ("canny", "softedge", "depth", "tile", "ip2p",
                  "lineart_anime"):
            validate_control_available(c)
