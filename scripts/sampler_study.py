#!/usr/bin/env python3
"""Seed-controlled pixel-sampler study (VERDICT r3 #4).

Question: configs/machina_ngp_hq.yml ships the EXPERIMENTAL
pixel_sampler: shuffled on an unexplained quality cliff — shuffled wins at
30k/48+48 (+1.2-1.6 dB observed) but craters 10k/24+24 runs (−3 dB). Is
the 30k win real across seeds, and is the mechanism the FIXED permutation
(batch-companion structure) or without-replacement epoch coverage?

Design: {random, shuffled} x 5 seeds + shuffled_epoch (fresh permutation
every epoch — keeps without-replacement coverage, destroys the fixed
permutation) x 3 seeds, on both regimes:
  fast10k: machina_ngp_fast.yml  (10k steps, 24+24)
  hq30k:   machina_ngp_hq.yml    (30k steps, 48+48)

Each run is one subprocess (fresh devices); results append to
logs/sweeps/sampler_study_r4.jsonl as {"regime","sampler","seed",
"val_psnr","val_psnr_mean","secs"} lines. Reads the run's metrics.jsonl
for the final val numbers. Resumable: completed (regime,sampler,seed)
triples found in the output log are skipped.

    python scripts/sampler_study.py [--only fast10k|hq30k]
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
OUT = os.path.join(ROOT, "logs", "sweeps", "sampler_study_r4.jsonl")

REGIMES = {
    "fast10k": "configs/machina_ngp_fast.yml",
    "hq30k": "configs/machina_ngp_hq.yml",
}
SEEDS_MAIN = [42, 7, 13, 21, 99]
SEEDS_EPOCH = [42, 7, 13]


def done_set():
    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                r = json.loads(line)
                if "error" not in r:  # failed/wedged cells retry on resume
                    done.add((r["regime"], r["sampler"], r["seed"]))
            except Exception:
                pass
    return done


def run_one(regime: str, sampler: str, seed: int) -> dict:
    rid = f"sampler_{regime}_{sampler}_s{seed}"
    logdir = os.path.join("logs", "sweeps", "sampler_study_r4")
    rundir = os.path.join(ROOT, logdir, rid)
    t0 = time.perf_counter()
    cmd = [
        sys.executable, os.path.join(ROOT, "scripts", "exp_train.py"),
        os.path.join(ROOT, REGIMES[regime]),
        "--set", f"experiment.randomseed={seed}",
        "--set", f"nerf.train.pixel_sampler={sampler}",
        "--set", f"experiment.id={rid}",
        "--set", f"experiment.logdir={logdir}",
        "--set", "experiment.validate_every=0",
        "--set", "experiment.save_every=0",
    ]
    rc, err, attempts = run_with_wedge_guard(
        cmd, ROOT, os.path.join(rundir, "metrics.jsonl"), timeout_s=3600)
    res = {"regime": regime, "sampler": sampler, "seed": seed,
           "secs": round(time.perf_counter() - t0, 1), "attempts": attempts}
    if rc != 0:
        res["error"] = err[-500:]
        return res
    vals = {}
    mpath = os.path.join(rundir, "metrics.jsonl")
    if os.path.exists(mpath):
        for line in open(mpath):
            m = json.loads(line)
            vals[m["tag"]] = m["value"]
    res["val_psnr"] = round(vals.get("val/psnr", float("nan")), 3)
    res["val_psnr_mean"] = round(vals.get("val/psnr_mean", float("nan")), 3)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, choices=list(REGIMES))
    args = ap.parse_args()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    done = done_set()
    jobs = []
    for regime in REGIMES:
        if args.only and regime != args.only:
            continue
        for sampler in ("random", "shuffled"):
            for seed in SEEDS_MAIN:
                jobs.append((regime, sampler, seed))
        for seed in SEEDS_EPOCH:
            jobs.append((regime, "shuffled_epoch", seed))
    for job in jobs:
        if job in done:
            print(f"skip (done): {job}", flush=True)
            continue
        print(f"run: {job}", flush=True)
        res = run_one(*job)
        with open(OUT, "a") as f:
            f.write(json.dumps(res) + "\n")
        print(f"  -> {res}", flush=True)


if __name__ == "__main__":
    main()
