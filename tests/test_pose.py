"""Native OpenPose port: network parity vs a torch oracle + postprocess
unit tests (role of controlnet_aux OpenposeDetector, reference
utils/controlnet_utils.py:28-60)."""

import math

import numpy as np
import pytest

from vidtome_tpu.control import pose

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_pose_state_dict(seed=0):
    """Random weights with the real body_pose_model.pth key layout."""
    g = torch.Generator().manual_seed(seed)

    def conv(name, cin, cout, k, sd):
        sd[f"{name}.weight"] = torch.randn((cout, cin, k, k),
                                           generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn((cout,), generator=g) * 0.05

    sd: dict = {}
    cin = 3
    for spec in pose._BACKBONE:
        if spec == "P":
            continue
        name, ch, k = spec
        conv(name, cin, ch, k, sd)
        cin = ch
    for branch, final in ((1, 38), (2, 19)):
        c = 128
        for name, ch, k in [(f"conv5_{i}_CPM_L{branch}", 128, 3)
                            for i in (1, 2, 3)] + [
                (f"conv5_4_CPM_L{branch}", 512, 1),
                (f"conv5_5_CPM_L{branch}", final, 1)]:
            conv(name, c, ch, k, sd)
            c = ch
    for stage in range(2, 7):
        for branch, final in ((1, 38), (2, 19)):
            c = 185
            for name, ch, k in [
                    (f"Mconv{i}_stage{stage}_L{branch}", 128, 7)
                    for i in (1, 2, 3, 4, 5)] + [
                    (f"Mconv6_stage{stage}_L{branch}", 128, 1),
                    (f"Mconv7_stage{stage}_L{branch}", final, 1)]:
                conv(name, c, ch, k, sd)
                c = ch
    return sd


def _torch_forward(sd, x_nchw):
    def c(name, h, k, relu=True):
        h = F.conv2d(h, sd[f"{name}.weight"], sd[f"{name}.bias"],
                     padding=k // 2)
        return F.relu(h) if relu else h

    h = x_nchw
    for spec in pose._BACKBONE:
        if spec == "P":
            h = F.max_pool2d(h, 2, 2)
            continue
        name, ch, k = spec
        h = c(name, h, k)
    feat = h
    paf = heat = None
    for stage in range(1, 7):
        inp = feat if stage == 1 else torch.cat([paf, heat, feat], 1)
        outs = []
        for branch, final in ((1, 38), (2, 19)):
            g = inp
            if stage == 1:
                layers = [(f"conv5_{i}_CPM_L{branch}", 3)
                          for i in (1, 2, 3)] + [
                    (f"conv5_4_CPM_L{branch}", 1),
                    (f"conv5_5_CPM_L{branch}", 1)]
            else:
                layers = [(f"Mconv{i}_stage{stage}_L{branch}", 7)
                          for i in (1, 2, 3, 4, 5)] + [
                    (f"Mconv6_stage{stage}_L{branch}", 1),
                    (f"Mconv7_stage{stage}_L{branch}", 1)]
            for i, (name, k) in enumerate(layers):
                g = c(name, g, k, relu=i < len(layers) - 1)
            outs.append(g)
        paf, heat = outs
    return paf, heat


class TestPoseNetworkParity:
    def test_converted_forward_matches_torch(self):
        import jax.numpy as jnp

        sd = _torch_pose_state_dict()
        x = torch.rand((1, 3, 32, 32),
                       generator=torch.Generator().manual_seed(1)) - 0.5
        with torch.no_grad():
            paf_ref, heat_ref = _torch_forward(sd, x)
        params = pose.convert_pose_state_dict(
            {k: v.numpy() for k, v in sd.items()})
        model = pose._build_model()
        paf, heat = model.apply(
            {"params": params},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(paf).transpose(0, 3, 1, 2), paf_ref.numpy(),
            atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(
            np.asarray(heat).transpose(0, 3, 1, 2), heat_ref.numpy(),
            atol=2e-4, rtol=2e-3)

    def test_module_prefixed_keys_accepted(self):
        sd = {"model0.conv1_1.weight": torch.zeros((64, 3, 3, 3)).numpy(),
              "model0.conv1_1.bias": torch.zeros((64,)).numpy()}
        params = pose.convert_pose_state_dict(sd)
        assert params["conv1_1"]["kernel"].shape == (3, 3, 3, 64)


def _synthetic_person(H=96, W=96):
    """Heatmaps + PAFs for one person with 5 joints (parts 2,3,4,6,7
    1-based: neck, both shoulders+elbows chain)."""
    pts = {2: (48, 20), 3: (30, 30), 4: (24, 52), 6: (66, 30),
           7: (72, 52)}  # part -> (x, y)
    heat = np.zeros((H, W, 19), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for part, (x, y) in pts.items():
        heat[:, :, part - 1] = np.exp(-((xx - x) ** 2 + (yy - y) ** 2)
                                      / (2 * 4.0 ** 2))
    paf = np.zeros((H, W, 38), np.float32)
    limbs = [(0, 2, 3), (2, 3, 4), (1, 2, 6), (4, 6, 7)]  # (k, pa, pb)
    for k, pa, pb in limbs:
        ax, ay = pts[pa]
        bx, by = pts[pb]
        vx, vy = bx - ax, by - ay
        norm = math.sqrt(vx * vx + vy * vy)
        ux, uy = vx / norm, vy / norm
        # thick corridor along the limb carries the unit vector
        for t in np.linspace(0, 1, 40):
            cx, cy = int(ax + vx * t), int(ay + vy * t)
            paf[max(0, cy - 3): cy + 4, max(0, cx - 3): cx + 4,
                pose._MAP_IDX[k][0] - 19] = ux
            paf[max(0, cy - 3): cy + 4, max(0, cx - 3): cx + 4,
                pose._MAP_IDX[k][1] - 19] = uy
    return heat, paf, pts


class TestPosePostprocess:
    def test_peaks_connections_subsets(self):
        heat, paf, pts = _synthetic_person()
        all_peaks = pose.find_peaks(heat)
        for part, (x, y) in pts.items():
            found = [(px, py) for px, py, *_ in all_peaks[part - 1]]
            assert any(abs(px - x) <= 2 and abs(py - y) <= 2
                       for px, py in found), (part, found)
        conns, special = pose.score_connections(all_peaks, paf,
                                                heat.shape[0])
        candidate, subset = pose.assemble_subsets(all_peaks, conns,
                                                  special)
        assert len(subset) == 1
        assert subset[0][-1] == 5  # all five joints assembled
        for part in pts:
            assert subset[0][part - 1] >= 0

    def test_draw_nonempty_and_shapes(self):
        heat, paf, _ = _synthetic_person()
        all_peaks = pose.find_peaks(heat)
        conns, special = pose.score_connections(all_peaks, paf,
                                                heat.shape[0])
        candidate, subset = pose.assemble_subsets(all_peaks, conns,
                                                  special)
        canvas = pose.draw_bodypose(np.zeros((96, 96, 3), np.uint8),
                                    candidate, subset)
        assert canvas.shape == (96, 96, 3)
        assert canvas.sum() > 0

    def test_empty_scene_draws_black(self):
        heat = np.zeros((64, 64, 19), np.float32)
        paf = np.zeros((64, 64, 38), np.float32)
        all_peaks = pose.find_peaks(heat)
        conns, special = pose.score_connections(all_peaks, paf, 64)
        candidate, subset = pose.assemble_subsets(all_peaks, conns,
                                                  special)
        canvas = pose.draw_bodypose(np.zeros((64, 64, 3), np.uint8),
                                    candidate, subset)
        assert canvas.sum() == 0


@pytest.mark.slow
class TestPoseEndToEnd:
    def test_pose_images_runs_with_random_weights(self, tmp_path):
        """Full detector path (env hook -> convert -> jit forward ->
        postprocess -> draw) on random weights: must run clean and emit
        [T, H, W, 3] in [0, 1]."""
        from safetensors.numpy import save_file

        sd = {k: v.numpy() for k, v in _torch_pose_state_dict().items()}
        p = tmp_path / "body_pose_model.safetensors"
        save_file(sd, str(p))
        imgs = np.random.default_rng(0).random((2, 64, 64, 3)).astype(
            np.float32)
        out = pose.pose_images(imgs, str(p))
        assert out.shape == imgs.shape
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_preprocess_dispatch_uses_env(self, tmp_path, monkeypatch):
        from safetensors.numpy import save_file

        from vidtome_tpu.control.preprocess import (
            control_preprocess, validate_control_available)

        sd = {k: v.numpy() for k, v in _torch_pose_state_dict().items()}
        p = tmp_path / "body_pose_model.safetensors"
        save_file(sd, str(p))
        monkeypatch.setenv("VIDTOME_POSE_MODEL", str(p))
        validate_control_available("openpose")  # no raise
        imgs = np.zeros((1, 64, 64, 3), np.float32)
        out = control_preprocess(imgs, "openpose")
        assert out.shape == imgs.shape

    def test_fail_fast_without_model(self, monkeypatch):
        from vidtome_tpu.control.preprocess import \
            validate_control_available

        monkeypatch.delenv("VIDTOME_POSE_MODEL", raising=False)
        try:
            import controlnet_aux  # noqa: F401
            pytest.skip("controlnet_aux installed")
        except ImportError:
            pass
        with pytest.raises(RuntimeError, match="pose model"):
            validate_control_available("openpose")
