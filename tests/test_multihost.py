"""Actual 2-process multi-host validation (VERDICT r3 missing #4).

Spawns two real OS processes that bring up ``jax.distributed`` over a
localhost coordinator (the DCN stand-in), each with 4 virtual CPU devices
(8 global), shard host-local image slices into a global array via
``parallel.multihost``, and run two NGP train steps over the global mesh.
Loss must match a single-process baseline running the identical program on
8 local devices — the multi-host data path changes nothing numerically.

Skips cleanly when the coordinator cannot come up (no free port / blocked
sockets); any failure AFTER distributed init is a real failure.
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = pathlib.Path(__file__).parent / "_multihost_worker.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(nproc: int):
    # Must be set BEFORE the worker interpreter starts: sitecustomize (e.g.
    # a TPU plugin) may import jax at startup, fixing the device count.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // nproc}"
    )
    return env


def _run_worker(port, pid, nproc, ckpt=None, timeout=300):
    argv = [sys.executable, str(WORKER), str(port), str(pid), str(nproc)]
    if ckpt:
        argv.append(ckpt)
    return subprocess.Popen(
        argv, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_worker_env(nproc),
    )


def _loss_from(out: str) -> float:
    for line in out.splitlines():
        if line.startswith("MULTIHOST_LOSS"):
            return float(line.split()[1])
    raise AssertionError(f"no MULTIHOST_LOSS line in output:\n{out}")


def test_two_process_training_matches_single_process():
    port = _free_port()
    procs = [_run_worker(port, pid, 2) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("2-process bring-up timed out (coordinator blocked?)")

    for rc, out, err in outs:
        if rc != 0:
            # Environment-level bring-up failures skip; anything after a
            # successful init is a real bug and must fail loudly.
            init_markers = ("DEADLINE_EXCEEDED", "Failed to connect",
                            "coordination service", "barrier",
                            "UNAVAILABLE: connection")
            if "MULTIHOST_LOSS" not in out and any(
                m in err for m in init_markers
            ):
                pytest.skip(f"jax.distributed bring-up failed:\n{err[-800:]}")
            raise AssertionError(
                f"multihost worker failed (rc={rc}):\n{err[-2000:]}"
            )

    losses = [_loss_from(out) for _, out, _ in outs]
    # Every process sees the same replicated loss.
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

    # Single-process baseline: identical program, 8 local devices.
    base = _run_worker(0, 0, 1)
    out, err = base.communicate(timeout=420)
    assert base.returncode == 0, f"baseline failed:\n{err[-2000:]}"
    baseline = _loss_from(out)
    assert losses[0] == pytest.approx(baseline, rel=1e-5), (
        f"2-process loss {losses[0]} != single-process {baseline}"
    )


def _pair(port, ckpt):
    """Run a 2-process leg; returns (ok, loss | skip-reason)."""
    procs = [_run_worker(port, pid, 2, ckpt=ckpt) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        return False, "2-process bring-up timed out"
    for rc, out, err in outs:
        if rc != 0:
            init_markers = ("DEADLINE_EXCEEDED", "Failed to connect",
                            "coordination service", "barrier",
                            "UNAVAILABLE: connection")
            if "MULTIHOST_LOSS" not in out and any(
                m in err for m in init_markers
            ):
                return False, f"jax.distributed bring-up failed:\n{err[-800:]}"
            raise AssertionError(
                f"multihost worker failed (rc={rc}):\n{err[-2000:]}"
            )
    losses = [_loss_from(out) for _, out, _ in outs]
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    return True, losses[0]


def test_checkpoint_round_trip_across_topologies(tmp_path):
    """VERDICT r4 #7: orbax save/restore must survive a topology change.

    Real multi-host failures live in checkpointing (OCDBT process-local
    dirs; sharding metadata on restore), not the step itself. Three legs,
    all ending in the SAME restore-then-one-step computation:

      baseline:  1-proc save → 1-proc restore + step
      cross A:   2-proc save → 1-proc restore + step
      cross B:   1-proc save → 2-proc restore + step

    The post-restore step is deterministic in the restored state (the PRNG
    key is part of it), so all three losses must agree exactly-ish.
    """
    base_dir = str(tmp_path / "ckpt_1proc")
    cross_dir = str(tmp_path / "ckpt_2proc")

    # 1-proc save.
    p = _run_worker(0, 0, 1, ckpt=f"save={base_dir}")
    out, err = p.communicate(timeout=420)
    assert p.returncode == 0, f"1-proc save failed:\n{err[-2000:]}"

    # 1-proc restore + step = the parity target.
    p = _run_worker(0, 0, 1, ckpt=f"restore={base_dir}")
    out, err = p.communicate(timeout=420)
    assert p.returncode == 0, f"1-proc restore failed:\n{err[-2000:]}"
    baseline = _loss_from(out)

    # Cross A: save under a 2-process mesh, restore single-process.
    ok, res = _pair(_free_port(), f"save={cross_dir}")
    if not ok:
        pytest.skip(res)
    p = _run_worker(0, 0, 1, ckpt=f"restore={cross_dir}")
    out, err = p.communicate(timeout=420)
    assert p.returncode == 0, (
        f"1-proc restore of 2-proc checkpoint failed:\n{err[-2000:]}"
    )
    assert _loss_from(out) == pytest.approx(baseline, rel=1e-5), (
        "2-proc save -> 1-proc restore diverged from the 1-proc round trip"
    )

    # Cross B: restore the 1-process checkpoint under a 2-process mesh.
    ok, res = _pair(_free_port(), f"restore={base_dir}")
    if not ok:
        pytest.skip(res)
    assert res == pytest.approx(baseline, rel=1e-5), (
        "1-proc save -> 2-proc restore diverged from the 1-proc round trip"
    )
