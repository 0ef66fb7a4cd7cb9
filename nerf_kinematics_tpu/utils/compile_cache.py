"""Persistent XLA compilation cache.

First compile of the fused train step is ~10-20 s (Mosaic + XLA); with the
persistent cache, later processes reuse it — repeat CLI invocations, bench
re-runs, and checkpoint-resume all skip straight to execution. Opt-out with
NERF_KINEMATICS_NO_COMPILE_CACHE=1 (or point NERF_KINEMATICS_CACHE_DIR
somewhere else, e.g. a shared fast disk).

Called from the CLI entry points and bench — NOT from package import
(library users keep full control of jax.config).
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    if os.environ.get("NERF_KINEMATICS_NO_COMPILE_CACHE"):
        return
    import jax

    path = os.environ.get(
        "NERF_KINEMATICS_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "nerf_kinematics_xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every compilation that takes meaningful time (default threshold
    # only caches >1s; the step programs all qualify, but small eval fns
    # benefit too).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
