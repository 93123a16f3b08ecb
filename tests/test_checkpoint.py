"""Native bundle checkpoint save/restore round trip."""

import jax
import pytest
import numpy as np

from tests.helpers import make_tiny_bundle


@pytest.mark.slow
def test_bundle_roundtrip(tmp_path):
    from vidtome_tpu.models.checkpoint import load_bundle, save_bundle

    bundle = make_tiny_bundle()
    # sd_version must be a registered config for reload; tiny is registered
    bundle.sd_version = "tiny"
    path = str(tmp_path / "ckpt")
    save_bundle(bundle, path)
    back = load_bundle(path)
    assert back.model_key == bundle.model_key
    assert back.vae_channels == ((8, 8, 8, 8), 1)
    orig = jax.tree.leaves(bundle.unet_params)
    rest = jax.tree.leaves(back.unet_params)
    assert len(orig) == len(rest)
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
