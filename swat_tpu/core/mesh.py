"""Device mesh and sharding helpers.

The reference (tian1327/SWAT) is strictly single-GPU — `torch.nn.DataParallel`
is commented out (reference utils/models.py:15-16).  In this rebuild SPMD
data-parallelism is the *default* execution mode: every train/eval step is
jit-compiled over a `jax.sharding.Mesh` with the batch sharded over the
``data`` axis and (optionally) model weights sharded over the ``model`` axis.
XLA inserts the `psum`/`all_gather` collectives over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. ``data`` × ``model`` must equal #devices used."""

    data: int = -1   # -1 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        if data * model > n_devices:
            raise ValueError(
                f"mesh {data}x{model} needs {data * model} devices, "
                f"have {n_devices}"
            )
        return data, model


def create_mesh(
    spec: MeshSpec | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    spec = spec or MeshSpec()
    data, model = spec.resolve(len(devices))
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a pytree of host arrays with the batch dim sharded on
    ``data``.  Leading dim of every leaf must be divisible by the data-axis
    size (the input pipeline pads to guarantee this)."""

    def _put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(_put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def resident_sharding(mesh: Optional[Mesh], n: int):
    """Sharding for resident split arrays of leading size ``n``: shard the
    example axis over ``data`` when it divides evenly, replicate otherwise
    (device_put needs even shards; the scan gather re-shards batches
    anyway via with_sharding_constraint)."""
    if mesh is None:
        return None
    if n % mesh.shape[DATA_AXIS] == 0:
        return NamedSharding(mesh, P(DATA_AXIS))
    return NamedSharding(mesh, P())
