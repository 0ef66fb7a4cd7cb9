#!/usr/bin/env python3
"""Experiment runner: train any YAML config with dotted overrides.

    python scripts/exp_train.py configs/machina_ngp.yml \
        --set experiment.logdir=/tmp/exp1 --set ngp.occ_proposal=grid \
        --set nerf.train.num_fine=32

Overrides are applied to the RAW config dict before dataclass construction,
so every reference-schema knob is reachable. Values parse as YAML (so
`true`, `0.1`, `[1,2]` all work). Prints a final JSON summary line with the
last/best val PSNR so sweep drivers can grep it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def apply_override(raw: dict, dotted: str) -> None:
    path, _, value = dotted.partition("=")
    keys = path.strip().split(".")
    node = raw
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = yaml.safe_load(value)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    help="dotted.path=value (YAML-parsed), repeatable")
    ap.add_argument("--eval-split", default=None,
                    help="after training, evaluate this split (val/test)")
    args = ap.parse_args()

    from nerf_kinematics_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from nerf_kinematics_tpu.train.config import config_from_dict
    from nerf_kinematics_tpu.train.trainer import Trainer

    with open(args.config) as f:
        raw = yaml.safe_load(f)
    for o in args.overrides:
        apply_override(raw, o)
    cfg = config_from_dict(raw)

    trainer = Trainer(cfg)
    result = trainer.fit()

    summary = {
        "config": args.config,
        "overrides": args.overrides,
        "final_val_psnr": result.val_psnr,
        "rays_per_sec": result.rays_per_sec,
        "last_metrics": {k: float(v) for k, v in result.last_metrics.items()},
    }
    if args.eval_split:
        ev = trainer.evaluate_split(result.state, args.eval_split)
        summary[f"{args.eval_split}_mean_psnr"] = ev["mean_psnr"]
    trainer.close()
    print("EXP_SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    sys.exit(main())
