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


def make_hybrid_mesh(n_data: int, n_space: int,
                     axis_names=("data", "space")) -> Mesh:
    """2D mesh for hybrid batch x width training (DP x SP).

    Use when the per-chip batch share would otherwise drop below 1 — e.g.
    high-resolution fine-tuning with B < n_chips. The train step needs no
    changes: place the batch with :func:`hybrid_shard_batch` and params
    replicated, and GSPMD emits conv halo exchanges along 'space' plus the
    gradient all-reduce over BOTH axes (the TPU-native generalization of
    the reference's batch-only DataParallel, core/train.py:68-69).
    """
    devices = jax.devices()
    need = n_data * n_space
    if need > len(devices):
        raise ValueError(
            f"requested {need} devices, only {len(devices)} present")
    return Mesh(
        np.array(devices[:need]).reshape(n_data, n_space), axis_names
    )


# batch-dict key -> (ndim, width axis) for the training batch layout
# (rmnet_tpu.core.train: frames/flows NHWC-style, masks B T K H W)
_TRAIN_WIDTH_AXES = {
    "frames": (5, 3),
    "masks": (5, 4),
    "flows": (5, 3),
}


def hybrid_shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a training batch on a 2D ('data', 'space') mesh: leading axis
    over 'data', frame width over 'space'; scalar-per-frame arrays
    (n_objects) shard over 'data' only. jit propagates these input
    shardings, so the unmodified train step runs as one hybrid GSPMD
    program."""
    d, s = mesh.axis_names
    out = {}
    for key, x in batch.items():
        nd_w = _TRAIN_WIDTH_AXES.get(key)
        if nd_w is not None and np.ndim(x) == nd_w[0]:
            spec = [None] * nd_w[0]
            spec[0] = d
            spec[nd_w[1]] = s
            sharding = NamedSharding(mesh, P(*spec))
        else:
            sharding = NamedSharding(mesh, P(d))
        out[key] = jax.device_put(x, sharding)
    return out


# jitted spatial programs, keyed by (apply config, mesh) — RMNetApply is a
# frozen-style dataclass and Mesh is hashable, so repeated serving calls
# reuse the compiled GSPMD executable
_SPATIAL_FNS: dict = {}


def spatial_sharding(mesh: Mesh, ndim: int, w_axis: int,
                     axis_name: str = "space") -> NamedSharding:
    """Sharding that splits a tensor's width axis across the mesh."""
    spec = [None] * ndim
    spec[w_axis] = axis_name
    return NamedSharding(mesh, P(*spec))


def spatial_forward_video(apply, variables, frames, masks, optical_flows,
                          n_objects, mesh: Optional[Mesh] = None,
                          n_devices: Optional[int] = None):
    """Spatially-partitioned whole-sequence inference: the frame WIDTH axis
    is sharded across the mesh and the full forward runs as ONE logical
    GSPMD program — XLA inserts the halo exchanges for convolutions and the
    collectives for the global reductions (bboxes, softmax normalizers)
    over ICI. This is a TPU-native capability beyond the reference (whose
    DataParallel can only parallelize over batch): a single latency-bound
    video spreads across chips.

    Weights are replicated; inputs follow RMNetApply.forward_video
    (rmnet.py:814-821). Returns est_masks gathered to the host layout.
    The jitted program is cached per (apply config, mesh): repeated calls
    (a serving loop over videos) retrace nothing and recompile only on a
    new input geometry.
    """
    mesh = mesh or make_mesh(n_devices, axis_name="space")
    key = (apply, mesh)
    fn = _SPATIAL_FNS.get(key)
    if fn is None:
        axis = mesh.axis_names[0]
        shard_w = lambda nd, w: spatial_sharding(mesh, nd, w, axis)
        fn = _SPATIAL_FNS[key] = jax.jit(
            apply.forward_video,
            in_shardings=(
                NamedSharding(mesh, P()),   # weights replicated
                shard_w(5, 3),              # frames  (B, T, H, W, 3)
                shard_w(5, 4),              # masks   (B, T, K, H, W)
                shard_w(5, 3),              # flows   (B, T, H, W, 2)
                NamedSharding(mesh, P()),   # n_objects
            ),
            out_shardings=NamedSharding(mesh, P()),
        )
    with mesh:
        return fn(variables, frames, masks, optical_flows, n_objects)
