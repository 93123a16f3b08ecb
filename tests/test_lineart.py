"""Native pix2pix UnetGenerator (anime lineart) vs a torch oracle with the
real checkpoint key layout (role of controlnet_aux lineart_anime,
reference utils/controlnet_utils.py:28-60)."""

import numpy as np
import pytest

from vidtome_tpu.control import lineart

torch = pytest.importorskip("torch")


def _build_torch_unet(ngf=64, num_downs=8, seed=0):
    """pix2pix UnetGenerator with InstanceNorm (no affine params) — the
    Anime2Sketch netG architecture; produces the real state-dict layout."""
    import functools

    import torch.nn as nn

    norm_layer = functools.partial(nn.InstanceNorm2d, affine=False,
                                   track_running_stats=False)

    class Block(nn.Module):
        def __init__(self, outer_nc, inner_nc, input_nc=None, submodule=None,
                     outermost=False, innermost=False):
            super().__init__()
            self.outermost = outermost
            use_bias = True  # InstanceNorm => biased convs in pix2pix
            if input_nc is None:
                input_nc = outer_nc
            downconv = nn.Conv2d(input_nc, inner_nc, 4, 2, 1, bias=use_bias)
            downrelu = nn.LeakyReLU(0.2, True)
            downnorm = norm_layer(inner_nc)
            uprelu = nn.ReLU(True)
            upnorm = norm_layer(outer_nc)
            if outermost:
                upconv = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1)
                model = [downconv, submodule, uprelu, upconv, nn.Tanh()]
            elif innermost:
                upconv = nn.ConvTranspose2d(inner_nc, outer_nc, 4, 2, 1,
                                            bias=use_bias)
                model = [downrelu, downconv, uprelu, upconv, upnorm]
            else:
                upconv = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1,
                                            bias=use_bias)
                model = [downrelu, downconv, downnorm, submodule, uprelu,
                         upconv, upnorm]
            self.model = nn.Sequential(*model)

        def forward(self, x):
            if self.outermost:
                return self.model(x)
            return torch.cat([x, self.model(x)], 1)

    torch.manual_seed(seed)
    blk = Block(ngf * 8, ngf * 8, innermost=True)
    for _ in range(num_downs - 5):
        blk = Block(ngf * 8, ngf * 8, submodule=blk)
    blk = Block(ngf * 4, ngf * 8, submodule=blk)
    blk = Block(ngf * 2, ngf * 4, submodule=blk)
    blk = Block(ngf, ngf * 2, submodule=blk)
    net = torch.nn.Module()
    net.model = Block(1, ngf, input_nc=3, submodule=blk, outermost=True)
    return net


@pytest.mark.slow
class TestLineartParity:
    def test_converted_forward_matches_torch(self):
        net = _build_torch_unet().eval()
        x = torch.rand((1, 3, 256, 256),
                       generator=torch.Generator().manual_seed(1)) * 2 - 1
        with torch.no_grad():
            want = net.model(x).numpy()

        params = lineart.convert_lineart_state_dict(
            {k: v.numpy() for k, v in net.state_dict().items()})
        got = np.asarray(lineart.unet_generator_apply(
            params, np.transpose(x.numpy(), (0, 2, 3, 1))))
        assert got.shape == (1, 256, 256, 1)
        np.testing.assert_allclose(got[0, :, :, 0], want[0, 0],
                                   atol=5e-3, rtol=5e-3)

    def test_lineart_edges_end_to_end(self, tmp_path):
        net = _build_torch_unet()
        ckpt = tmp_path / "netG.pth"
        # real Anime2Sketch checkpoints carry a DataParallel 'module.' prefix
        torch.save({f"module.{k}": v for k, v in net.state_dict().items()},
                   ckpt)
        imgs = np.random.default_rng(0).random((1, 100, 120, 3)).astype(
            np.float32)
        out = lineart.lineart_edges(imgs, str(ckpt))
        assert out.shape == (1, 100, 120, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_preprocess_uses_lineart_when_model_set(self, tmp_path,
                                                    monkeypatch):
        from vidtome_tpu.control.preprocess import lineart_anime_preprocess

        net = _build_torch_unet()
        torch.save(net.state_dict(), tmp_path / "netG.pth")
        monkeypatch.setenv("VIDTOME_LINEART_MODEL",
                           str(tmp_path / "netG.pth"))
        imgs = np.random.default_rng(1).random((1, 64, 64, 3)).astype(
            np.float32)
        out = lineart_anime_preprocess(imgs)
        assert out.shape == (1, 64, 64, 3)
        assert np.isfinite(out).all()
