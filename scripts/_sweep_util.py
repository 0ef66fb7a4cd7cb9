"""Shared sweep-driver helper: run one training subprocess with a wedge
guard.

The remote-chip (axon) tunnel occasionally wedges a FRESH client on its
first dispatch: the subprocess sleeps forever on one RPC with ~zero CPU
(observed twice in round 4; utils/backend_probe.py covers the
jax.devices() flavor of the same failure). A wedged cell would eat the
whole sweep's wall-clock budget, so drivers watch the run's
metrics.jsonl — the Trainer flushes it on every print cadence as a
heartbeat — and kill + retry the subprocess after a cooldown when the
heartbeat stalls.
"""

from __future__ import annotations

import os
import subprocess
import time


def run_with_wedge_guard(cmd, cwd, heartbeat_path, *,
                         first_beat_s=420.0, stall_s=300.0,
                         timeout_s=7200.0, retries=2, cooldown_s=45.0,
                         log=print):
    """Run ``cmd``; return (returncode, stderr_tail, attempts).

    ``heartbeat_path`` is the run's metrics.jsonl. Until it first grows,
    allow ``first_beat_s`` (imports + tunnel bring-up + first compiles);
    after that, ``stall_s`` without growth (or an overall ``timeout_s``)
    kills the attempt. Wedge-killed attempts retry up to ``retries``
    times after ``cooldown_s``.
    """
    for attempt in range(retries + 1):
        if attempt:
            log(f"  wedge guard: retry {attempt} after {cooldown_s:.0f}s cooldown")
            time.sleep(cooldown_s)
        p = subprocess.Popen(cmd, cwd=cwd, stdout=subprocess.PIPE,
                             stderr=subprocess.PIPE, text=True)
        t0 = time.perf_counter()
        last_size = -1
        last_change = t0
        wedged = False
        while True:
            rc = p.poll()
            if rc is not None:
                out, err = p.communicate()
                return rc, (err or "")[-2000:], attempt + 1
            now = time.perf_counter()
            size = (os.path.getsize(heartbeat_path)
                    if os.path.exists(heartbeat_path) else -1)
            if size != last_size:
                last_size, last_change = size, now
            budget = first_beat_s if last_size <= 0 else stall_s
            if now - last_change > budget or now - t0 > timeout_s:
                wedged = True
                break
            time.sleep(5.0)
        p.kill()
        p.wait()
        log(f"  wedge guard: killed stalled attempt {attempt + 1} "
            f"(no heartbeat for {time.perf_counter() - last_change:.0f}s)")
    return -9, "wedge guard: all attempts stalled", retries + 1
