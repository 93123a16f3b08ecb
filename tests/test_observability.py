"""Merge-stats collection + logging utilities."""

import jax
import pytest
import jax.numpy as jnp

from vidtome_tpu.logging_utils import collect_tome_stats, get_logger, timed
from vidtome_tpu.models.tome import ToMeCall, ToMeConfig
from vidtome_tpu.models.unet import TINY_UNET, UNet2DConditionModel


@pytest.mark.slow
def test_tome_stats_collection():
    tome = ToMeConfig(frames=4, local_merge_ratio=0.9, collect_stats=True)
    model = UNet2DConditionModel(config=TINY_UNET, tome=tome,
                                 dtype=jnp.float32, use_pallas=False)
    x = jnp.zeros((4, 16, 16, 4))
    ctx = jnp.zeros((4, 8, 32))
    call = ToMeCall(key=jax.random.key(0), bank_mode="off")
    params = model.init(jax.random.key(1), x, jnp.asarray(0), ctx,
                        tome_call=call, num_lanes=1)
    out, aux = model.apply(params, x, jnp.asarray(0), ctx, tome_call=call,
                           num_lanes=1, mutable=["tome_stats"])
    stats = collect_tome_stats(aux["tome_stats"])
    assert stats, "no stats collected"
    merged_blocks = [v for v in stats.values() if "compression" in v]
    assert merged_blocks
    for v in merged_blocks:
        assert 0.2 < v["compression"] < 0.6  # ratio 0.9, chunk 4 => ~0.325
        assert v["merged_len"] < v["seq_len"]


def test_logger_and_timed(capsys):
    log = get_logger()
    with timed("unit-stage", log):
        pass
    captured = capsys.readouterr().out
    assert "unit-stage took" in captured
