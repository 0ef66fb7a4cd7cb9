"""Multi-host (multi-process) support: DCN-side initialization + host-local
input sharding.

SURVEY.md §2.5/§5.8: intra-step communication is all ICI (psum from sharding
annotations); DCN is only for process bring-up and input pipelines. This
module wraps the standard ``jax.distributed`` bring-up and provides the
host-sharding rule for datasets: every host loads the full (small) pose
table but only its slice of the image set, then builds globally-sharded
arrays with ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process; no-op (returns
    False) for single-process runs or if already initialized."""
    try:
        if jax.process_count() > 1:
            return True  # already initialized by the launcher
    except RuntimeError:
        pass
    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_local_slice(n_items: int) -> slice:
    """This process's contiguous slice of an n_items-long dataset axis."""
    p, n = jax.process_index(), jax.process_count()
    per = -(-n_items // n)
    return slice(p * per, min((p + 1) * per, n_items))


def make_global_batch(local_batch: np.ndarray, mesh, axis_name: str = "data"):
    """Assemble a globally-sharded array from per-host local batches (each
    host contributes its shard of the leading axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    return jax.make_array_from_process_local_data(sharding, local_batch)
