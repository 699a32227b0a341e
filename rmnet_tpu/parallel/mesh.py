"""Mesh construction and sharding helpers (data-parallel axis 'data').

The training step is jitted with batch inputs sharded along 'data' and
parameters replicated; under GSPMD, XLA emits the psum for gradient
all-reduce over ICI automatically — the TPU-native equivalent of
DataParallel's scatter/gather (reference core/train.py:68-69), except the
model is compiled once, not replicated per device by Python.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} present"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def data_parallel_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place every array in a pytree with its leading axis sharded."""
    sharding = data_parallel_sharding(mesh, axis_name)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
