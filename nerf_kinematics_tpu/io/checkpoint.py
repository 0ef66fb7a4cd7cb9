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


def _adapt_tree(raw: Any, target: Any) -> Any:
    """Map an orbax raw-restored tree (nested dict/list containers) onto the
    structure of ``target``, migrating layout differences:

    * container in ``raw`` where ``target`` expects a 1-D vector → ravel the
      container's leaves in tree_flatten order and concatenate (the per-leaf
      → flattened-optimizer moment migration);
    * NamedTuples in ``target`` are rebuilt from raw dicts by field name
      (orbax serializes them as dicts) or from raw sequences positionally.
    """
    import jax.numpy as jnp

    is_leaf_target = hasattr(target, "dtype") and hasattr(target, "shape")
    raw_is_container = isinstance(raw, (dict, list, tuple))
    if is_leaf_target:
        if raw_is_container:
            leaves = jax.tree_util.tree_leaves(raw)
            flat = jnp.concatenate([jnp.ravel(jnp.asarray(x)) for x in leaves])
            if flat.shape != tuple(target.shape):
                raise ValueError(
                    f"cannot migrate checkpoint subtree: flattened size "
                    f"{flat.shape} != expected {tuple(target.shape)}"
                )
            return flat.astype(target.dtype)
        return jnp.asarray(raw, dtype=target.dtype).reshape(target.shape)
    if target is None:
        return None
    if raw is None:
        # Stateless optax nodes (EmptyState, MaskedState(EmptyState))
        # serialize as None — keep the freshly-initialized target node.
        if jax.tree_util.tree_leaves(target):
            raise ValueError(
                "cannot migrate checkpoint: saved None where arrays expected"
            )
        return target
    if hasattr(target, "_fields"):  # NamedTuple (optax states / TrainState)
        fields = target._fields
        if isinstance(raw, dict):
            raw_by_field = {f: raw.get(f) for f in fields}
        else:
            raw_by_field = dict(zip(fields, list(raw) + [None] * len(fields)))
        # Pre-EMA checkpoints resumed with ema_decay > 0: the saved
        # TrainState has no (or a None) 'ema' subtree while the target
        # expects a param-shaped one — seed the shadow from the restored
        # params instead of erroring (ADVICE r3).
        if (
            "ema" in fields
            and "params" in fields
            and raw_by_field.get("ema") is None
            and jax.tree_util.tree_leaves(getattr(target, "ema"))
        ):
            params = _adapt_tree(raw_by_field["params"], getattr(target, "params"))
            import jax.numpy as jnp

            raw_by_field["params"] = params
            raw_by_field["ema"] = jax.tree_util.tree_map(
                lambda p: jnp.array(p, copy=True), params
            )
        parts = [_adapt_tree(raw_by_field[f], getattr(target, f)) for f in fields]
        return type(target)(*parts)
    if isinstance(target, dict):
        return {k: _adapt_tree(raw[k], v) for k, v in target.items()}
    if isinstance(target, (list, tuple)):
        return type(target)(_adapt_tree(r, t) for r, t in zip(raw, target))
    # Non-array leaf (e.g. python scalar) — pass the raw value through.
    return raw


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
        jax.eval_shape'd pytree). Returns (state, step) or (None, None).

        Falls back to a layout migration when the saved tree's structure
        differs from the target: checkpoints written before the flattened
        optimizer (optax.flatten(adam), see train/loop.make_optimizer) store
        per-leaf Adam mu/nu trees; those are raveled into the flat vectors
        the current optimizer expects. Exact, not approximate —
        ravel_pytree order IS tree_flatten order, shared by both layouts.
        """
        import logging

        log = logging.getLogger("nerf_kinematics_tpu.io")
        if step is not None:
            return self._restore_step(abstract_state, step)
        # Auto-resume: an unreadable latest checkpoint (partial write, a
        # stripped working tree) must not kill the run — fall back through
        # older steps, loudly, and start fresh only when none restores.
        for s in sorted(self._mgr.all_steps(), reverse=True):
            try:
                return self._restore_step(abstract_state, s)
            except Exception as e:
                log.warning(
                    "checkpoint %d is unreadable (%s: %.200s); trying the "
                    "previous one", s, type(e).__name__, e,
                )
        return None, None

    def _restore_step(self, abstract_state: Any, step: int):
        # Propagate mesh shardings from the target state into the restore
        # spec: orbax then places every restored shard directly on the
        # right devices — required for multi-host restore (each process
        # reads only what its devices need) and for restoring onto a
        # DIFFERENT topology than the one that saved (SURVEY.md §5.3-5.4;
        # exercised cross-topology by tests/test_multihost.py).
        def to_abstract(x):
            if not hasattr(x, "dtype"):
                return x
            sharding = getattr(x, "sharding", None)
            if isinstance(sharding, jax.sharding.NamedSharding):
                return jax.ShapeDtypeStruct(
                    np.shape(x), x.dtype, sharding=sharding
                )
            return jax.ShapeDtypeStruct(np.shape(x), x.dtype)

        abstract = jax.tree_util.tree_map(to_abstract, abstract_state)
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore({"state": abstract})
            )
            return restored["state"], step
        except Exception:
            raw = self._mgr.restore(step)
            import logging

            logging.getLogger("nerf_kinematics_tpu.io").warning(
                "checkpoint %d has a different tree layout; migrating "
                "(per-leaf optimizer moments -> flattened)", step
            )
            return _adapt_tree(raw["state"], abstract_state), step

    def close(self):
        self._mgr.close()
