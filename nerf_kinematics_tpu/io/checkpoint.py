"""Orbax-based checkpointing with auto-resume.

TPU-native equivalent of both reference persistence paths (SURVEY.md §5.3-5.4):
periodic ``checkpoint{iter}`` saves with the same logical content
(step/params/opt_state/loss/psnr) plus latest-checkpoint auto-resume. Legacy
torch-layout import/export lives in torch_compat; single-file compressed
snapshots (.ingp-style) in snapshot.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Saves/restores TrainState-shaped pytrees under ``dir/checkpoint_{step}``."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave({"state": state}))
        self._mgr.wait_until_finished()
        if metrics:
            import json

            with open(os.path.join(self.directory, f"metrics_{step}.json"), "w") as f:
                json.dump({k: float(v) for k, v in metrics.items()}, f)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: Any, step: Optional[int] = None):
        """Restore into the structure of ``abstract_state`` (a concrete or
        jax.eval_shape'd pytree). Returns (state, step) or (None, None)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None, None
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
            if hasattr(x, "dtype")
            else x,
            abstract_state,
        )
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore({"state": abstract})
        )
        return restored["state"], step

    def close(self):
        self._mgr.close()
