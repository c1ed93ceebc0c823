"""Multi-host initialization.

The reference has no distributed launcher (SURVEY.md §2.3 — SLURM only
schedules independent 1-GPU jobs).  Here multi-host TPU slices initialize
through `jax.distributed` with the standard TPU environment autodetection;
meshes created afterwards (`core.mesh.create_mesh`) span all hosts'
devices, and per-host input pipelines feed their local shard.
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host.

    Triggers when explicit arguments are given or when the standard env
    vars are present (JAX_COORDINATOR_ADDRESS / TPU pod runtime vars).
    Returns True if distributed mode is active."""
    import jax

    explicit = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    if not explicit and not on_pod:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return True
    except (RuntimeError, ValueError):
        # already initialized (or single-process run)
        return jax.process_count() > 1


def create_multislice_mesh(dcn_data: int, ici_data: int,
                           ici_model: int = 1, devices=None):
    """Mesh for multi-slice TPU: the slow DCN link carries ONLY the outer
    data axis (gradient all-reduce once per step), while tensor-parallel
    collectives stay on intra-slice ICI.  Axes are ('data', 'model') with
    the data axis spanning dcn_data * ici_data — drop-in for
    core.mesh.create_mesh, so every data_sharding/partition-spec helper
    works unchanged (the scaling-book multi-slice recipe; the reference
    has no distributed training at all, SURVEY.md §2.3).
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devices = list(devices) if devices is not None else jax.devices()
    need = dcn_data * ici_data * ici_model
    if len(devices) != need:
        raise ValueError(
            f"multislice mesh {dcn_data}x{ici_data}x{ici_model} needs "
            f"{need} devices, got {len(devices)}")
    virtual = getattr(devices[0], "platform", "") == "cpu"
    if virtual:
        # virtual/CPU devices carry no slice topology — row-major layout
        # with the same logical shape (tests, dryruns)
        dev = np.asarray(devices).reshape(dcn_data * ici_data, ici_model)
    else:
        # on real hardware a topology mismatch must FAIL, not silently
        # degrade to TP-over-DCN
        from jax.experimental import mesh_utils

        dev = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(ici_data, ici_model),
            dcn_mesh_shape=(dcn_data, 1),
            devices=devices)
    dev = np.asarray(dev).reshape(dcn_data * ici_data, ici_model)
    return Mesh(dev, ("data", "model"))


def process_local_slice(n_items: int) -> slice:
    """This host's contiguous shard of a length-n dataset (per-host input
    pipelines feed only their shard; GSPMD assembles the global batch)."""
    import jax

    per = n_items // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
