"""Wedge-safe accelerator backend probe.

The remote-chip (axon) backend can wedge: ``jax.devices()`` then HANGS
forever instead of raising, taking down any entry point that touches jax
in-process. Probing in a subprocess with a hard timeout lets callers
(bench.py, __graft_entry__.dryrun_multichip) detect the wedge and fall
back to a CPU path instead of hanging. Costs one extra backend init
(~10-20 s through the tunnel) on healthy starts — cheap insurance for
driver-run artifacts.
"""

from __future__ import annotations

import os
import subprocess
import sys


def probe_backend(timeout_s: float = 150.0) -> bool:
    """True if ``jax.devices()`` completes within ``timeout_s`` in a fresh
    interpreter (or the process is already pinned to CPU)."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return True
    except Exception:
        return False
