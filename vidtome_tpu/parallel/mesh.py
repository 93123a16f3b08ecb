"""Device-mesh parallelism: data-parallel frames + tensor-parallel attention.

The reference is strictly single-GPU (SURVEY.md §2: no distributed code at
all); this module is the TPU-native scaling layer built on
``jax.sharding`` + GSPMD.  Two mesh axes:

  * ``data`` — shards the frame/batch axis.  DDIM inversion is
    embarrassingly parallel over frames; generation shards the
    (lanes x frames) batch of each chunk call.  XLA turns the cross-frame
    merge gathers into collectives over ICI automatically.
  * ``model`` — tensor parallelism: attention heads and MLP hidden dims are
    sharded via parameter PartitionSpecs (megatron-style: column-parallel
    qkv/ff-in, row-parallel out/ff-out); XLA inserts the psum after
    row-parallel matmuls.

Everything is expressed as sharding annotations on params/activations under
``jit`` — single-chip and multi-chip share one code path, and the same
program runs on a virtual CPU mesh for testing
(``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    assert len(devices) >= n, (
        f"need {n} devices for mesh (data={data}, model={model}), "
        f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def mesh_from_config(tpu_cfg: Any) -> Optional[Mesh]:
    """Build a mesh from the ``tpu.mesh`` config section
    (e.g. ``{data: 4, model: 2}``); None -> single device (no mesh)."""
    if not tpu_cfg or not tpu_cfg.get("mesh"):
        return None
    spec = tpu_cfg["mesh"]
    return make_mesh(int(spec.get("data", 1)), int(spec.get("model", 1)))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (frame/batch) axis across 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Tensor-parallel parameter layouts.
# ---------------------------------------------------------------------------

# (path regex, PartitionSpec for the kernel) — matched against '/'-joined
# flax param paths.  Column-parallel layers shard the output dim; the
# row-parallel layer closing each block shards the input dim, leaving a
# partial sum that XLA completes with a psum over 'model'.
_TP_RULES: list[tuple[str, P]] = [
    (r"attn\d/to_(q|k|v)/kernel$", P(None, "model")),
    (r"attn\d/to_out/kernel$", P("model", None)),
    (r"ff/proj_in/kernel$", P(None, "model")),
    (r"ff/proj_out/kernel$", P("model", None)),
    # NOTE: the timestep-embedding MLP is deliberately NOT sharded: it is
    # negligible compute ([B, 4*ch] activations), and sharding it alongside
    # the FF rules provokes a GSPMD propagation interaction that corrupts
    # results (reproduced on the 8-device CPU mesh; see tests/test_parallel).
]

# Bias rules: biases of column-parallel layers are sharded on their only dim.
_TP_BIAS_RULES: list[tuple[str, P]] = [
    (r"attn\d/to_(q|k|v)/bias$", P("model")),
    (r"ff/proj_in/bias$", P("model")),
]


def param_spec(path: str) -> P:
    for pattern, spec in _TP_RULES + _TP_BIAS_RULES:
        if re.search(pattern, path):
            return spec
    return P()


def _map_with_path(tree: Any, fn, prefix: str = "") -> Any:
    """Map ``fn(path, leaf)`` over a nested-dict param tree.  (We avoid
    jax.tree.map over PartitionSpec trees: PartitionSpec subclasses tuple
    and would be flattened as a pytree node.)"""
    if isinstance(tree, dict):
        return {k: _map_with_path(v, fn, f"{prefix}/{k}" if prefix else k)
                for k, v in tree.items()}
    return fn(prefix, tree)


def unet_param_specs(params: Any) -> Any:
    """Nested dict of PartitionSpecs for a UNet param tree (TP layout)."""
    return _map_with_path(params, lambda path, _: param_spec(path))


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place params on the mesh per the TP rules ('model' axis);
    everything else replicated."""
    return _map_with_path(
        params,
        lambda path, a: jax.device_put(
            a, NamedSharding(mesh, param_spec(path))))


def shard_batch(mesh: Mesh, x):
    return jax.device_put(x, batch_sharding(mesh))


def shard_replicated(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
