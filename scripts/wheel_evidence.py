#!/usr/bin/env python3
"""Wheel-capture evidence runs (VERDICT r4 Missing #3b).

STATUS.md quotes two wheel results whose logs were never committed: the
end-to-end pipeline reproducing the thesis's low-parallax failure band
(11–12 dB), and the 4/7/11-frame frames-vs-quality ablation
(≈9.4/11.2/12.1 dB). This script runs both on the REAL capture
(`/root/reference/datasets/nerf-raw/wheel_real_robot`) via the shipped
`cli.full_pipeline` and commits the artifacts:

    logs/wheel-real/full/         — report.json + parallax.json + orbit.mp4
                                    + scene.ply from the full pipeline
    logs/wheel-real/ablation_N/   — report.json per frame-count N
    logs/wheel-real/wheel_evidence_r5.jsonl — one summary row per run

Resumable: runs with an existing report.json are skipped.

    python scripts/wheel_evidence.py [--capture DIR] [--steps 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CAPTURE = "/root/reference/datasets/nerf-raw/wheel_real_robot"
OUT = os.path.join(ROOT, "logs", "wheel-real")
SUMMARY = os.path.join(OUT, "wheel_evidence_r5.jsonl")


def run_pipeline(out_dir: str, extra: list[str], capture: str,
                 steps: int) -> dict:
    report = os.path.join(out_dir, "report.json")
    row: dict = {"out": os.path.relpath(out_dir, ROOT), "extra": extra}
    if os.path.exists(report):
        row["skipped"] = "already done"
    else:
        cmd = [
            sys.executable, "-m", "nerf_kinematics_tpu.cli.full_pipeline",
            "--capture", capture, "--out", out_dir, "--steps", str(steps),
        ] + extra
        t0 = time.perf_counter()
        p = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                           timeout=3600)
        row["secs"] = round(time.perf_counter() - t0, 1)
        if p.returncode != 0:
            row["error"] = (p.stderr or p.stdout)[-500:]
            return row
    try:
        rep = json.load(open(report))
        row["val_psnr"] = rep.get("val_psnr")
        row["rays_per_sec"] = rep.get("rays_per_sec")
        row["directional_std"] = (rep.get("parallax") or {}).get(
            "directional_std")
        row["low_parallax_warning"] = rep.get("low_parallax_warning")
    except Exception as e:  # noqa: BLE001
        row["error"] = f"report unreadable: {e}"
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--capture", default=DEFAULT_CAPTURE)
    ap.add_argument("--steps", type=int, default=2000)
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)

    runs = [("full", [])] + [
        (f"ablation_{n}", ["--limit-frames", str(n), "--skip-video",
                           "--skip-mesh"])
        for n in (4, 7, 11)
    ]
    with open(SUMMARY, "a") as f:
        for name, extra in runs:
            row = run_pipeline(os.path.join(OUT, name), extra,
                               args.capture, args.steps)
            row["id"] = name
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
