"""Single-file compressed snapshots — the ``.ingp``-style export/import.

The fast-NeRF reference saves zlib-compressed single-file snapshots
(``--save_snapshot/--load_snapshot``, instant_ngp_collab_cloud.ipynb cell 23;
zstr/zlib dep in the build, cell 5). Equivalent here: the parameter pytree is
flattened to named numpy arrays, serialized with flax's msgpack, zlib
compressed, and wrapped with a small header (magic, version, metadata json).
"""

from __future__ import annotations

import json
import zlib
from typing import Any, Optional, Tuple

import numpy as np
from flax import serialization

MAGIC = b"NKTSNAP1"


def save_snapshot(path: str, state: Any, metadata: Optional[dict] = None) -> None:
    """Write a compressed single-file snapshot of a pytree + json metadata."""
    import jax

    host_state = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, state
    )
    payload = serialization.msgpack_serialize(host_state)
    meta = json.dumps(metadata or {}).encode()
    blob = zlib.compress(payload, level=6)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(len(meta).to_bytes(8, "little"))
        f.write(meta)
        f.write(blob)


def load_snapshot(path: str) -> Tuple[Any, dict]:
    """Read a snapshot → (pytree, metadata)."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not a snapshot (bad magic {magic!r})")
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode())
        blob = f.read()
    state = serialization.msgpack_restore(zlib.decompress(blob))
    return state, meta
