#!/usr/bin/env python3
"""Evaluate a trained checkpoint on a split at arbitrary (overridden)
validation settings — no training. Separates train-side from eval-side
quality: e.g. does rendering the flagship checkpoint with a 64+128 budget
beat the 48+48 it was validated with?

    python scripts/eval_ckpt.py configs/machina_ngp.yml \
        --ckpt logs/machina-ngp/checkpoints \
        --set nerf.validation.num_coarse=64 --set nerf.validation.num_fine=128 \
        [--split val]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from exp_train import apply_override  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    args = ap.parse_args()

    from nerf_kinematics_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from nerf_kinematics_tpu.io.checkpoint import CheckpointManager
    from nerf_kinematics_tpu.train.config import config_from_dict
    from nerf_kinematics_tpu.train.trainer import Trainer

    with open(args.config) as f:
        raw = yaml.safe_load(f)
    for o in args.overrides:
        apply_override(raw, o)
    cfg = config_from_dict(raw)

    trainer = Trainer(cfg)
    state = trainer.engine.init_state(0)
    state, step = CheckpointManager(args.ckpt).restore(state)
    if state is None:
        raise SystemExit(f"no checkpoint found under {args.ckpt}")
    ev = trainer.evaluate_split(state, args.split)
    print(json.dumps({
        "config": args.config,
        "overrides": args.overrides,
        "ckpt_step": int(step),
        "split": args.split,
        "mean_psnr": round(ev["mean_psnr"], 3),
        "per_frame": [round(float(s), 3) for s in ev["per_frame"]],
    }))


if __name__ == "__main__":
    main()
