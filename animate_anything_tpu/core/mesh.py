"""Device mesh + sharding helpers.

The reference scales with HF Accelerate / DeepSpeed over NCCL (data
parallelism only — /root/reference/train.py:378-383, example/deepspeed.yaml).
Here the single distributed-runtime primitive is a ``jax.sharding.Mesh`` with
named axes:

- ``data``   — batch data-parallel axis (grad psum rides ICI);
- ``frame``  — frame/sequence axis: video frames are i.i.d. through all
  spatial layers (the model computes on a fused ``b*f`` batch), so sharding
  frames is a cheap context-parallel axis that only communicates around
  temporal attention/convs;
- ``tensor`` — optional tensor-parallel axis over attention heads / mlp
  columns for the wide (1280-ch) blocks.

XLA inserts the collectives from sharding constraints — no NCCL analog needed.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_FRAME = "frame"
AXIS_TENSOR = "tensor"
ALL_AXES = (AXIS_DATA, AXIS_FRAME, AXIS_TENSOR)


def create_mesh(
    shape: Mapping[str, int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a mesh. ``shape`` maps axis name → size; a single ``-1`` entry
    absorbs the remaining devices. Default: everything on ``data``."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = {AXIS_DATA: n}
    names = list(shape.keys())
    sizes = list(shape.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one mesh axis may be -1")
    if -1 in sizes:
        known = math.prod(s for s in sizes if s != -1)
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    want = math.prod(sizes)
    if want > n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {want} > {n} devices")
    dev_array = np.asarray(devices[:want]).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def named_sharding(mesh: Mesh, *axes: str | None | tuple) -> NamedSharding:
    """NamedSharding over mesh; axes align to array dims (None = replicated)."""
    return NamedSharding(mesh, P(*axes))


def shard_batch(batch, mesh: Mesh, axis: str = AXIS_DATA):
    """Place a host batch pytree onto the mesh, sharding dim 0 over ``axis``."""
    def _put(x):
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(_put, batch)


def constrain(x, mesh: Mesh, *axes: str | None | tuple):
    """with_sharding_constraint under an explicit mesh (no-op on 1-device)."""
    if math.prod(mesh.devices.shape) == 1:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*axes)))


def local_mesh_axes(mesh: Mesh) -> dict[str, int]:
    return dict(zip(mesh.axis_names, mesh.devices.shape))
