"""Multi-device sharding tests on the virtual 8-device CPU mesh:
data-parallel frame sharding + tensor-parallel head/MLP sharding must
compile, execute, and agree with the unsharded forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidtome_tpu.models.tome import ToMeCall, ToMeConfig
from vidtome_tpu.models.unet import TINY_UNET, UNet2DConditionModel
from vidtome_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    model = UNet2DConditionModel(config=TINY_UNET, dtype=jnp.float32,
                                 use_pallas=False)
    x = jax.random.normal(jax.random.key(0), (8, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(1), (8, 8, 32))
    params = model.init(jax.random.key(2), x, jnp.asarray(0), ctx)["params"]
    return model, params, x, ctx


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert pmesh.param_spec(
        "down_0_attentions_0/transformer_blocks_0/attn1/to_q/kernel"
    ) == P(None, "model")
    assert pmesh.param_spec(
        "down_0_attentions_0/transformer_blocks_0/attn1/to_out/kernel"
    ) == P("model", None)
    assert pmesh.param_spec(
        "up_1_attentions_0/transformer_blocks_0/ff/proj_in/kernel"
    ) == P(None, "model")
    assert pmesh.param_spec("conv_in/kernel") == P()
    assert pmesh.param_spec(
        "mid_attentions_0/transformer_blocks_0/attn1/to_q/bias"
    ) == P("model")


def test_dp_tp_forward_matches_unsharded(setup):
    model, params, x, ctx = setup
    expected = model.apply({"params": params}, x, jnp.asarray(10), ctx)

    mesh = pmesh.make_mesh(data=4, model=2)
    sp = pmesh.shard_params(mesh, params)
    sx = pmesh.shard_batch(mesh, x)
    sctx = pmesh.shard_batch(mesh, ctx)

    @jax.jit
    def fwd(p, x, ctx):
        return model.apply({"params": p}, x, jnp.asarray(10), ctx)

    with mesh:
        got = fwd(sp, sx, sctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_sharded_merged_forward(setup):
    """Token merging (cross-frame gathers) under dp+tp sharding: the joined
    frame axis spans data-parallel shards, so XLA must insert collectives —
    result must still match the unsharded merged forward."""
    _, params, x, ctx = setup
    tome = ToMeConfig(frames=4, local_merge_ratio=0.9)
    model = UNet2DConditionModel(config=TINY_UNET, tome=tome,
                                 dtype=jnp.float32, use_pallas=False)
    call = ToMeCall(key=jax.random.key(5), bank_mode="off")
    expected = model.apply({"params": params}, x, jnp.asarray(10), ctx,
                           tome_call=call, num_lanes=2)

    mesh = pmesh.make_mesh(data=4, model=2)
    sp = pmesh.shard_params(mesh, params)
    sx = pmesh.shard_batch(mesh, x)
    sctx = pmesh.shard_batch(mesh, ctx)

    @jax.jit
    def fwd(p, x, ctx):
        return model.apply(
            {"params": p}, x, jnp.asarray(10), ctx,
            tome_call=ToMeCall(key=jax.random.key(5), bank_mode="off"),
            num_lanes=2)

    with mesh:
        got = fwd(sp, sx, sctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_inverter_style_dp_sharding(setup):
    """Frame-batch sharding alone (the inversion-stage layout)."""
    model, params, x, ctx = setup
    mesh = pmesh.make_mesh(data=8, model=1)
    sp = pmesh.shard_replicated(mesh, params)
    sx = pmesh.shard_batch(mesh, x)
    sctx = pmesh.shard_batch(mesh, ctx)

    @jax.jit
    def fwd(p, x, ctx):
        return model.apply({"params": p}, x, jnp.asarray(10), ctx)

    with mesh:
        got = fwd(sp, sx, sctx)
    expected = model.apply({"params": params}, x, jnp.asarray(10), ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


class TestMultihostInit:
    """initialize_multihost: single-process no-op vs config wiring (a real
    pod can't be tested here; the contract is the call order + idempotence
    + the no-op path never touching jax.distributed)."""

    def test_single_process_autodetect_is_noop(self, monkeypatch):
        from vidtome_tpu.parallel import distributed as D

        for m in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                  "COORDINATOR_ADDRESS", "SLURM_JOB_ID"):
            monkeypatch.delenv(m, raising=False)
        monkeypatch.setattr(D, "_initialized", False)
        assert D.initialize_multihost() is False

    def test_config_gate(self, monkeypatch):
        from vidtome_tpu.config import Config
        from vidtome_tpu.parallel import distributed as D

        monkeypatch.setattr(D, "_initialized", False)
        assert D.initialize_from_config(None) is False
        assert D.initialize_from_config(Config({"multihost": False})) is False

    def test_idempotent_once_initialized(self, monkeypatch):
        from vidtome_tpu.parallel import distributed as D

        monkeypatch.setattr(D, "_initialized", True)
        # must short-circuit without calling jax.distributed.initialize
        assert D.initialize_multihost("bogus:0", 2, 0) is True
