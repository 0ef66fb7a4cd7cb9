"""Parallelism: device mesh + sharding specs.

NeRF's natural parallelism is data-parallel over rays (SURVEY.md §2.5): the
ray batch shards over the mesh ``data`` axis, parameters stay replicated, and
XLA inserts the gradient all-reduce (psum over ICI) automatically from the
sharding annotations — no explicit collectives in user code.
"""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]
