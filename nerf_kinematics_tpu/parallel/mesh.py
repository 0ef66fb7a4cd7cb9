"""Device mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices; rays shard over this axis."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (ray/batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, small state)."""
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Optional[Mesh], axis_name: str = DATA_AXIS):
    """Inside-jit constraint: pin a batch tensor's leading dim to the data
    axis (no-op when mesh is None — single-device path)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(axis_name))
    )
