#!/usr/bin/env python3
"""Fox compute/capacity scale-up study (round 4, VERDICT r3 #7 follow-up).

Finding that motivates this: the shipped fox recipe (25k steps x 4096
rays) trains to val 24.93 dB with TRAIN psnr at 25.2 — the model does not
fit even the training views, and 25k*4096 = 102M ray samples is almost
exactly ONE epoch over the 49 train frames' 1080x1920 pixels. Pose
registration is NOT the binding constraint (stage-1 val-pose photometric
alignment buys only +0.27 dB; stage-2 joint train-pose refinement
regresses — logs/fox-ngp/pose_refine_r4.json). The binding constraint is
train-view fit, so spend compute: bigger ray batches (more epochs) and,
if train psnr saturates, more encoder capacity.

Variants run sequentially on the real chip; results append to
logs/sweeps/fox_scale_r4.jsonl. Resumable: completed ids are skipped.

    python scripts/fox_scale_study.py [--only ID]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

from _sweep_util import run_with_wedge_guard

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "logs", "sweeps", "fox_scale_r4.jsonl")

# id -> list of dotted overrides on top of configs/fox_ngp.yml.
# ROUND-5 NOTE: fox_ngp.yml now SHIPS the scaled recipe this study chose
# (16k rays, C=96/T=256, shuffled), so reproducing the round-4 cells
# requires explicitly overriding DOWN to the round-3 baseline (4k rays,
# C=64/T=192, random sampler) for the control cells. Expected values from
# the round-4 study (config header): baseline 24.93, rays-alone 24.40,
# steps-alone 24.40, capacity+rays 25.40, +shuffled 25.72.
_R3_BASE = [
    "ngp.n_components=64",
    "ngp.table_size=192",
    "nerf.train.pixel_sampler=random",
]
VARIANTS = {
    # Round-3 shipped recipe (the study's baseline).
    "baseline_r3": _R3_BASE + ["nerf.train.num_random_rays=4096"],
    # 4 epochs instead of 1 at unchanged capacity: rays alone don't help.
    "r16k_25k": _R3_BASE + ["nerf.train.num_random_rays=16384"],
    # ~6.5 epochs, unchanged capacity: steps alone don't help either.
    "r16k_40k": _R3_BASE + [
        "nerf.train.num_random_rays=16384",
        "experiment.train_iters=40000",
    ],
    # 4 epochs + wider CP encoder (capacity matched with batch).
    "r16k_25k_c96": [
        "nerf.train.num_random_rays=16384",
        "nerf.train.pixel_sampler=random",
    ],
    # + the shuffled sampler == the SHIPPED recipe (zero overrides beyond
    # the ray count the config already carries; kept as the anchor cell).
    "r16k_25k_c96_shuf": ["nerf.train.num_random_rays=16384"],
}

# Round-5 wave (VERDICT r4 #6): next rung of the capacity x batch ladder —
# one more capacity step at 32k-ray batches over ~8 epochs, seed-checked
# once. Results go to fox_scale_r5.jsonl; fox_scale_r4.jsonl keeps the
# round-4 cells (recommitted evidence for the shipped recipe's header).
R5_VARIANTS = {
    # Shipped round-4 recipe rerun under the round-5 fused step (anchor
    # cell: same semantics as r16k_25k_c96_shuf, fresh code path).
    "r5_anchor_c96": [
        "nerf.train.num_random_rays=16384",
        "ngp.n_components=96",
        "ngp.table_size=256",
    ],
    # Capacity step + bigger batch + longer horizon (~8 epochs).
    "r5_c128_r32k_50k": [
        "nerf.train.num_random_rays=32768",
        "ngp.n_components=128",
        "ngp.table_size=256",
        "experiment.train_iters=50000",
    ],
    # Seed check of the same cell.
    "r5_c128_r32k_50k_s1": [
        "nerf.train.num_random_rays=32768",
        "ngp.n_components=128",
        "ngp.table_size=256",
        "experiment.train_iters=50000",
        "experiment.randomseed=1",
    ],
}


def done_set():
    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                r = json.loads(line)
                if "error" not in r:
                    done.add(r["id"])
            except Exception:
                pass
    return done


def run_one(vid: str) -> dict:
    rid = f"fox_scale_{vid}"
    logdir = os.path.join(
        "logs", "sweeps",
        "fox_scale_r5" if vid.startswith("r5_") else "fox_scale_r4")
    rundir = os.path.join(ROOT, logdir, rid)
    cmd = [
        sys.executable, os.path.join(ROOT, "scripts", "exp_train.py"),
        os.path.join(ROOT, "configs", "fox_ngp.yml"),
        "--set", f"experiment.id={rid}",
        "--set", f"experiment.logdir={logdir}",
        "--set", "experiment.validate_every=5000",
        # keep the final checkpoint for val-pose alignment afterwards
        "--set", "experiment.save_every=25000" if not vid.startswith("r5_")
        else "experiment.save_every=50000",
    ] + [a for o in VARIANTS[vid] for a in ("--set", o)]
    t0 = time.perf_counter()
    # The remote compile helper has been observed to take 10-20 min per
    # fresh program shape (round 5); budget the guard accordingly so slow
    # compiles aren't mistaken for wedges.
    rc, err, attempts = run_with_wedge_guard(
        cmd, ROOT, os.path.join(rundir, "metrics.jsonl"), timeout_s=7200,
        first_beat_s=1500.0, stall_s=1500.0)
    res = {"id": vid, "overrides": VARIANTS[vid], "attempts": attempts,
           "secs": round(time.perf_counter() - t0, 1)}
    if rc != 0:
        res["error"] = err[-500:]
        return res
    tags = {}
    mpath = os.path.join(rundir, "metrics.jsonl")
    if os.path.exists(mpath):
        for line in open(mpath):
            m = json.loads(line)
            tags[m["tag"]] = m["value"]
    res["val_psnr"] = round(tags.get("val/psnr", float("nan")), 3)
    res["train_psnr"] = round(tags.get("train/psnr", float("nan")), 3)
    res["rays_per_sec"] = round(tags.get("perf/rays_per_sec", 0.0))
    return res


def main():
    global OUT, VARIANTS
    ap = argparse.ArgumentParser()
    ap.add_argument("--wave", default="r4", choices=["r4", "r5"])
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    if args.wave == "r5":
        VARIANTS = R5_VARIANTS
        OUT = OUT.replace("fox_scale_r4", "fox_scale_r5")
    if args.only and args.only not in VARIANTS:
        raise SystemExit(f"unknown --only {args.only} for wave {args.wave}")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    done = done_set()
    for vid in VARIANTS:
        if args.only and vid != args.only:
            continue
        if vid in done:
            print(f"skip (done): {vid}", flush=True)
            continue
        print(f"run: {vid}", flush=True)
        res = run_one(vid)
        with open(OUT, "a") as f:
            f.write(json.dumps(res) + "\n")
        print(f"  -> {res}", flush=True)


if __name__ == "__main__":
    main()
