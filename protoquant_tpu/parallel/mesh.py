"""Device mesh construction (SURVEY.md §5.8 — the TPU-native 'comm backend').

The transport is ICI within a pod slice and DCN across slices, both driven by
XLA's collective runtime; the user-facing API is a named Mesh + collectives.
Multi-host init goes through jax.distributed.initialize (call once per
process before building the mesh).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

from ..utils.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. dp*tp must equal len(devices)."""
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    dp, tp = cfg.dp, cfg.tp
    if dp * tp != n:
        raise ValueError(f"mesh {dp}x{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, cfg.axis_names)


def init_multihost(coordinator: str | None = None, num_processes: int | None = None,
                   process_id: int | None = None):
    """Multi-host bring-up: each host process calls this before make_mesh.

    On TPU pods with the standard env (TPU_WORKER_HOSTNAMES etc.) argument-free
    initialize() autodetects everything.
    """
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
