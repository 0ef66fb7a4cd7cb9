#!/usr/bin/env python3
"""Flagship budget probe under the winning sampler (round 4 follow-up).

If the seed-controlled sampler study (scripts/sampler_study.py) shows
`shuffled` matching-or-beating `random` across seeds, the one throughput
lever it unlocks is the 24+48 coarse budget: under random, 24+48 loses
~0.5 dB val-mean to 48+48 (configs/machina_ngp.yml header), but the
round-3 shuffled probe had it at parity. The sigma-coarse pass is
~1.2 ms of the 5.42 ms flagship step, so halving the coarse budget is a
direct rays/s win IF quality holds across seeds.

Cells: {48+48, 24+48} x sampler x 3 seeds @10k on machina_ngp.yml.
Results append to logs/sweeps/flagship_budget_r4.jsonl; completed cells
are skipped on resume.

    python scripts/flagship_budget_probe.py [--sampler shuffled]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from _sweep_util import run_with_wedge_guard

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "logs", "sweeps", "flagship_budget_r4.jsonl")

BUDGETS = {"c48": 48, "c24": 24}
SEEDS = [42, 7, 13]


def done_set():
    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                r = json.loads(line)
                if "error" not in r:
                    done.add((r["budget"], r["sampler"], r["seed"]))
            except Exception:
                pass
    return done


def run_one(budget: str, sampler: str, seed: int) -> dict:
    rid = f"flagship_{budget}_{sampler}_s{seed}"
    logdir = os.path.join("logs", "sweeps", "flagship_budget_r4")
    rundir = os.path.join(ROOT, logdir, rid)
    cmd = [
        sys.executable, os.path.join(ROOT, "scripts", "exp_train.py"),
        os.path.join(ROOT, "configs", "machina_ngp.yml"),
        "--set", f"experiment.randomseed={seed}",
        "--set", f"nerf.train.pixel_sampler={sampler}",
        "--set", f"nerf.train.num_coarse={BUDGETS[budget]}",
        "--set", f"experiment.id={rid}",
        "--set", f"experiment.logdir={logdir}",
        "--set", "experiment.validate_every=0",
        "--set", "experiment.save_every=0",
    ]
    t0 = time.perf_counter()
    rc, err, attempts = run_with_wedge_guard(
        cmd, ROOT, os.path.join(rundir, "metrics.jsonl"), timeout_s=3600)
    res = {"budget": budget, "sampler": sampler, "seed": seed,
           "secs": round(time.perf_counter() - t0, 1), "attempts": attempts}
    if rc != 0:
        res["error"] = err[-500:]
        return res
    tags = {}
    mpath = os.path.join(rundir, "metrics.jsonl")
    if os.path.exists(mpath):
        for line in open(mpath):
            m = json.loads(line)
            tags[m["tag"]] = m["value"]
    res["val_psnr_mean"] = round(tags.get("val/psnr_mean", float("nan")), 3)
    res["rays_per_sec"] = round(tags.get("perf/rays_per_sec", 0.0))
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sampler", default="shuffled")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    done = done_set()
    for budget in BUDGETS:
        for seed in SEEDS:
            job = (budget, args.sampler, seed)
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
