#!/usr/bin/env python3
"""Summarize logs/sweeps/sampler_study_r4.jsonl: mean ± std val-PSNR-mean
per (regime, sampler) cell, plus the pairwise deltas the study exists to
measure (shuffled vs random; shuffled_epoch vs shuffled separates
"without-replacement epoch coverage" from "one fixed permutation")."""

from __future__ import annotations

import json
import math
import os
import sys

PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "logs", "sweeps", "sampler_study_r4.jsonl")


def load(path=PATH):
    cells = {}
    for line in open(path):
        r = json.loads(line)
        if "error" in r or r.get("val_psnr_mean") is None:
            continue
        v = r["val_psnr_mean"]
        if isinstance(v, float) and math.isnan(v):
            continue
        cells.setdefault((r["regime"], r["sampler"]), []).append(v)
    return cells


def stats(xs):
    m = sum(xs) / len(xs)
    sd = (sum((x - m) ** 2 for x in xs) / max(len(xs) - 1, 1)) ** 0.5
    return m, sd


def main():
    cells = load(sys.argv[1] if len(sys.argv) > 1 else PATH)
    for (regime, sampler), xs in sorted(cells.items()):
        m, sd = stats(xs)
        print(f"{regime:8s} {sampler:15s} n={len(xs)} "
              f"mean={m:6.3f} std={sd:5.3f} vals={sorted(round(x,2) for x in xs)}")
    for regime in sorted({k[0] for k in cells}):
        base = cells.get((regime, "random"))
        for other in ("shuffled", "shuffled_epoch"):
            xs = cells.get((regime, other))
            if base and xs:
                dm = stats(xs)[0] - stats(base)[0]
                pooled = (stats(xs)[1] ** 2 + stats(base)[1] ** 2) ** 0.5
                print(f"{regime}: {other} - random = {dm:+.3f} dB "
                      f"(pooled spread {pooled:.3f})")


if __name__ == "__main__":
    main()
