"""Numerical-health guards.

SURVEY.md §5.2: no sanitizers exist in the reference; the TPU build relies on
JAX purity + explicit NaN checks. ``checked_step`` wraps a train step with
``jax.experimental.checkify`` NaN/Inf detection (debug runs), and
``assert_finite_tree`` is a lightweight host-side audit for tests and
checkpoint boundaries.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def assert_finite_tree(tree: Any, name: str = "pytree") -> None:
    """Host-side: raise if any leaf contains NaN/Inf."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def checked_step(step_fn: Callable) -> Callable:
    """Wrap a jitted-able train step with checkify NaN/div-by-zero checks.
    Returns (state, metrics) and raises on the first numerical error.

    Debug tool — adds overhead; don't use in production training loops.
    """
    from jax.experimental import checkify

    checked = checkify.checkify(
        step_fn, errors=checkify.float_checks
    )

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
