"""Multi-host initialization for pod-scale meshes.

The reference has no distributed runtime at all (SURVEY.md §5 lists the
comm backend as ABSENT); the TPU-native equivalent is JAX's multi-process
runtime: every host runs the same program, ``jax.distributed.initialize``
wires the coordination service, and ``jax.devices()`` then spans the whole
pod so the GSPMD meshes built in ``parallel/mesh.py`` shard across ICI/DCN
transparently — the single-chip and pod code paths stay identical.

Config surface (all optional — TPU pods autodetect everything):

  tpu:
    multihost: true            # call jax.distributed.initialize()
    coordinator: "host0:1234"  # non-TPU/manual clusters only
    num_processes: 4           #   "
    process_id: 0              #   "

Call ``initialize_from_config`` BEFORE any jax backend use (the CLI does
this right after config load).
"""

from __future__ import annotations

from typing import Any, Optional

_initialized = False


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         force: bool = False) -> bool:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    On TPU pods all arguments autodetect from the runtime environment; on
    manual clusters pass all three.  Returns True when the distributed
    runtime is (now) initialized, False when it was skipped because this
    is a single-process run with no coordinator configured.  ``force``
    (set when the user explicitly configured ``tpu.multihost: true``)
    skips the environment-marker heuristic and always attempts
    initialization — jax's own autodetection covers platforms (e.g.
    GCE-metadata-based Cloud TPU slices) the markers can't see, and an
    explicit request should fail loudly rather than silently run
    single-host."""
    global _initialized
    if _initialized:
        return True
    import jax

    if (not force and coordinator_address is None and num_processes is None
            and process_id is None):
        # Heuristic autodetect path for implicit callers: only attempt
        # under a multi-host TPU runtime or a cluster env (SLURM/GKE)
        # jax knows how to introspect.  A plain single-process run has
        # nothing to initialize.
        import os

        markers = ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                   "COORDINATOR_ADDRESS", "SLURM_JOB_ID")
        if not any(m in os.environ for m in markers):
            return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    print(f"[INFO] multi-host jax initialized: process "
          f"{jax.process_index()}/{jax.process_count()}, "
          f"{jax.device_count()} global devices")
    return True


def initialize_from_config(tpu_cfg: Any) -> bool:
    """Wire ``tpu.multihost`` (+ optional manual coordinator fields)."""
    if not tpu_cfg or not tpu_cfg.get("multihost"):
        return False
    np_ = tpu_cfg.get("num_processes")
    pid = tpu_cfg.get("process_id")
    return initialize_multihost(
        coordinator_address=tpu_cfg.get("coordinator"),
        num_processes=int(np_) if np_ is not None else None,
        process_id=int(pid) if pid is not None else None,
        force=True)
