"""PnP injection semantics: with the attention flag on, every lane must use
lane 0's attention MAP while keeping its own values — verified directly on
the CrossAttention layer (reference utils/pnp_utils.py:47-95)."""

import jax
import jax.numpy as jnp
import numpy as np

from vidtome_tpu.models.layers import CrossAttention, inject_lane0


def test_inject_lane0_select():
    x = jnp.stack([jnp.full((4, 2), float(i)) for i in range(3)])  # 3 lanes
    on = inject_lane0(x, 3, jnp.asarray(True))
    np.testing.assert_array_equal(np.asarray(on), np.zeros_like(on))
    off = inject_lane0(x, 3, jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(off), np.asarray(x))
    # lane-major blocks of F=2 frames: every lane's block becomes lane 0's
    xf = jnp.concatenate([jnp.full((2, 4, 2), float(i)) for i in range(3)])
    onf = np.asarray(inject_lane0(xf, 3, jnp.asarray(True)))
    np.testing.assert_array_equal(onf, np.tile(np.asarray(xf)[:2], (3, 1, 1)))


def test_share_qk_uses_source_attention_map():
    """With share_qk on and IDENTICAL values across lanes, outputs must be
    identical to lane 0's output for every lane; with distinct values,
    outputs differ only through V (same attention weights)."""
    attn = CrossAttention(query_dim=16, heads=2, head_dim=8,
                          dtype=jnp.float32, use_pallas=False)
    key = jax.random.key(0)
    lane0 = jax.random.normal(key, (1, 12, 16))
    lanes = jnp.concatenate([lane0,
                             jax.random.normal(jax.random.key(1), (1, 12, 16)),
                             jax.random.normal(jax.random.key(2), (1, 12, 16))])
    params = attn.init(jax.random.key(3), lanes)

    out_inj = attn.apply(params, lanes, share_qk=jnp.asarray(True),
                         num_lanes=3)
    out_plain = attn.apply(params, lanes)
    # lane 0 unchanged by injection
    np.testing.assert_allclose(np.asarray(out_inj)[0],
                               np.asarray(out_plain)[0], rtol=1e-5, atol=1e-5)
    # other lanes change (their own QK is replaced by lane 0's)
    assert np.abs(np.asarray(out_inj)[1] - np.asarray(out_plain)[1]).max() > 1e-4

    # oracle: lane i output == softmax(q0 k0) @ v_i
    def manual(params, x_lane, qk_lane):
        p = params["params"]
        qm = (qk_lane @ np.asarray(p["to_q"]["kernel"]))
        km = (qk_lane @ np.asarray(p["to_k"]["kernel"]))
        vm = (x_lane @ np.asarray(p["to_v"]["kernel"]))
        H, D = 2, 8
        S = qm.shape[0]
        qh = qm.reshape(S, H, D).transpose(1, 0, 2)
        kh = km.reshape(S, H, D).transpose(1, 0, 2)
        vh = vm.reshape(S, H, D).transpose(1, 0, 2)
        w = np.exp((qh @ kh.transpose(0, 2, 1)) / np.sqrt(D)
                   - np.max((qh @ kh.transpose(0, 2, 1)) / np.sqrt(D), -1,
                            keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        o = (w @ vh).transpose(1, 0, 2).reshape(S, H * D)
        return o @ np.asarray(p["to_out"]["kernel"]) + np.asarray(
            p["to_out"]["bias"])

    lane2 = np.asarray(lanes)[2]
    expected = manual(params, lane2, np.asarray(lanes)[0])
    np.testing.assert_allclose(np.asarray(out_inj)[2], expected,
                               rtol=1e-4, atol=1e-4)
