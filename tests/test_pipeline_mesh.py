"""Pipelines on a device mesh: invert + generate end-to-end with
dp x tp sharding on the 8-device virtual CPU mesh, results consistent with
the single-device run."""

import os

import jax
import numpy as np
import pytest

from tests.helpers import make_tiny_bundle, make_tiny_video
from tests.test_pipeline_e2e import _base_config
from vidtome_tpu.parallel.mesh import make_mesh, mesh_from_config

pytestmark = [pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 virtual devices"),
              pytest.mark.slow]


def test_mesh_from_config():
    from vidtome_tpu.config import Config

    assert mesh_from_config(None) is None
    assert mesh_from_config(Config({"mesh": None})) is None
    mesh = mesh_from_config(Config({"mesh": {"data": 4, "model": 2}}))
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_pipeline_on_mesh_matches_single_device(tmp_path):
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.pipeline.inverter import Inverter

    bundle = make_tiny_bundle()
    video = make_tiny_video(str(tmp_path / "v"), n_frames=8, size=64)
    cfg = _base_config(str(tmp_path), video, merge_global=True)

    Inverter(bundle, cfg, use_pallas=False)(
        cfg.input_path, cfg.inversion.save_path)
    single = Generator(bundle, cfg, use_pallas=False)(
        cfg.input_path, cfg.generation.latents_path,
        os.path.join(str(tmp_path), "out_single"),
        frame_ids=list(range(8)))["edit"]

    mesh = make_mesh(data=4, model=2)
    meshed = Generator(bundle, cfg, use_pallas=False, mesh=mesh)(
        cfg.input_path, cfg.generation.latents_path,
        os.path.join(str(tmp_path), "out_mesh"),
        frame_ids=list(range(8)))["edit"]

    assert meshed.shape == single.shape
    assert np.isfinite(meshed).all()
    # merging decisions are discrete and can flip on reduction-order ulps,
    # so require close-but-not-bitwise agreement at the image level
    diff = np.abs(meshed - single).mean()
    assert diff < 0.02, f"mesh vs single mean |diff| {diff}"


def test_merge_plans_identical_mesh_vs_single():
    """Same key => identical MergePlan index arrays on the 8-device mesh
    and on one device (VERDICT r1: stronger than image-level closeness)."""
    import jax.numpy as jnp

    from vidtome_tpu.core import merge as M
    from vidtome_tpu.parallel.mesh import shard_batch

    key = jax.random.key(11)
    x = jax.random.normal(key, (2, 4 * 64, 16), jnp.float32)

    def plans_of(x):
        _, plans = M.compute_local_merge(x, 4, 0.9, jax.random.key(3))
        return [(p.merge_gather, p.unmerge_gather, p.unm_idx) for p in plans]

    single = jax.jit(plans_of)(x)
    mesh = make_mesh(data=2, model=4)  # 8 devices; lanes shard over 'data'
    with mesh:
        meshed = jax.jit(plans_of)(shard_batch(mesh, x))
    for s, m in zip(jax.tree.leaves(single), jax.tree.leaves(meshed)):
        np.testing.assert_array_equal(np.asarray(s), np.asarray(m))


def test_eps_near_bitwise_pure_dp():
    """Pure data parallelism (the inversion layout): one merged UNet chunk
    forward on a data=8 mesh must match single-device eps to float32
    tolerance (no TP psum => no reduction-order slack)."""
    import jax.numpy as jnp

    from vidtome_tpu.models.tome import ToMeCall, ToMeConfig
    from vidtome_tpu.parallel.mesh import shard_batch, shard_replicated

    bundle = make_tiny_bundle()
    tome = ToMeConfig(frames=4, local_merge_ratio=0.9, merge_global=True,
                      global_merge_ratio=0.8)
    unet = bundle.make_unet(tome=tome)
    key = jax.random.key(0)
    x = jax.random.normal(key, (8, 16, 16, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.key(1), (8, 8, 32), jnp.float32)
    params = bundle.unet_params

    def fwd(params, x, ctx):
        out, _ = unet.apply(
            {"params": params}, x, jnp.asarray(3), ctx,
            tome_call=ToMeCall(key=jax.random.key(7), bank_mode="init"),
            num_lanes=2, mutable=["tome_bank"])
        return out

    single = np.asarray(jax.jit(fwd)(params, x, ctx))

    mesh = make_mesh(data=8, model=1)
    with mesh:
        meshed = np.asarray(jax.jit(fwd)(
            shard_replicated(mesh, params), shard_batch(mesh, x),
            shard_batch(mesh, ctx)))
    np.testing.assert_allclose(meshed, single, atol=1e-5, rtol=1e-5)


def test_pipeline_pure_dp_generation(tmp_path):
    """Pipeline-level data=8 generation (the pure-DP layout) runs and stays
    consistent with the single-device result."""
    from vidtome_tpu.pipeline.generator import Generator
    from vidtome_tpu.pipeline.inverter import Inverter

    bundle = make_tiny_bundle()
    video = make_tiny_video(str(tmp_path / "v"), n_frames=8, size=64)
    cfg = _base_config(str(tmp_path), video, merge_global=True)

    Inverter(bundle, cfg, use_pallas=False)(
        cfg.input_path, cfg.inversion.save_path)
    single = Generator(bundle, cfg, use_pallas=False)(
        cfg.input_path, cfg.generation.latents_path,
        os.path.join(str(tmp_path), "out_single"),
        frame_ids=list(range(8)))["edit"]

    mesh = make_mesh(data=8, model=1)
    meshed = Generator(bundle, cfg, use_pallas=False, mesh=mesh)(
        cfg.input_path, cfg.generation.latents_path,
        os.path.join(str(tmp_path), "out_dp"),
        frame_ids=list(range(8)))["edit"]
    assert np.isfinite(meshed).all()
    diff = np.abs(meshed - single).mean()
    assert diff < 2e-3, f"pure-DP vs single mean |diff| {diff}"


def test_pallas_flash_attention_under_gspmd_sharding():
    """The production flash-attention Pallas kernel (interpret mode on
    CPU), invoked inside plain jit with batch sharded over 'data' and
    heads over 'model' — exactly how the UNet's attention sees sharded
    operands under the mesh (GSPMD partitions the kernel call).  Must
    match the unsharded oracle."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vidtome_tpu.ops.attention import (flash_attention,
                                           reference_attention)

    mesh = make_mesh(data=4, model=2)
    B, H, S, D = 4, 2, 256, 64
    q = jax.random.normal(jax.random.key(0), (B, H, S, D), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (B, H, S, D), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (B, H, S, D), jnp.float32)
    ref = np.asarray(reference_attention(q, k, v))

    sh = NamedSharding(mesh, P("data", "model"))
    qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v, interpret=True))
    with mesh:
        out = np.asarray(f(qs, ks, vs))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_pallas_flash_attention_sharded_with_kv_mask():
    """Same, with a KV valid-length mask (the merged-sequence path)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vidtome_tpu.ops.attention import (flash_attention,
                                           reference_attention)

    mesh = make_mesh(data=8, model=1)
    B, H, S, D = 8, 2, 256, 64
    n_valid = 200
    q = jax.random.normal(jax.random.key(3), (B, H, S, D), jnp.float32)
    k = jax.random.normal(jax.random.key(4), (B, H, S, D), jnp.float32)
    v = jax.random.normal(jax.random.key(5), (B, H, S, D), jnp.float32)
    ref = np.asarray(reference_attention(q, k, v, kv_valid_len=n_valid))

    sh = NamedSharding(mesh, P("data"))
    qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))
    f = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, kv_valid_len=n_valid, interpret=True))
    with mesh:
        out = np.asarray(f(qs, ks, vs))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
