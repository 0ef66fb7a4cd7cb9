#!/usr/bin/env python3
"""Steady-state train-step time for a YAML config (+ dotted overrides),
using the same two-scan-length subtraction as bench.py (immune to per-call
dispatch latency under the remote-chip tunnel).

    python scripts/step_time.py configs/machina_ngp.yml \
        --set ngp.fold=hash --set ngp.table_size=128
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from exp_train import apply_override  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    args = ap.parse_args()

    from nerf_kinematics_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from nerf_kinematics_tpu.train.config import config_from_dict
    from nerf_kinematics_tpu.train.trainer import Trainer
    from nerf_kinematics_tpu.utils.flops import (
        train_step_flops,
        train_step_useful_flops,
    )

    with open(args.config) as f:
        raw = yaml.safe_load(f)
    for o in args.overrides:
        apply_override(raw, o)
    cfg = config_from_dict(raw)
    cfg = cfg.replace(experiment=dataclasses.replace(
        cfg.experiment, logdir="/tmp/step_time_logs"))

    trainer = Trainer(cfg)
    engine, ds = trainer.engine, trainer.dataset
    images, poses = trainer.images, trainer.poses
    n_rays = cfg.nerf.num_random_rays
    spr = cfg.nerf.train.num_coarse + cfg.nerf.train.num_fine

    state = engine.init_state(0)
    times = {}
    for n in (8, 40):
        many = engine.make_train_many(ds.intrinsics, ds.near, ds.far,
                                      ds.use_ndc, steps_per_call=n)
        compiled = many.lower(state, images, poses, trainer.ray_buf).compile()
        s = state
        for _ in range(2):
            s, m = compiled(s, images, poses, trainer.ray_buf)
            float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(3):
            s, m = compiled(s, images, poses, trainer.ray_buf)
            float(m["loss"])
        times[n] = (time.perf_counter() - t0) / 3
        state = engine.init_state(0)
    step_s = (times[40] - times[8]) / 32

    flops = train_step_flops(cfg, n_rays)
    useful = train_step_useful_flops(cfg, n_rays)
    peak = {"TPU v5 lite": 197e12}.get(jax.devices()[0].device_kind)
    print(json.dumps({
        "overrides": args.overrides,
        "step_ms": round(step_s * 1e3, 3),
        "rays_per_sec": round(n_rays / step_s),
        "samples_per_sec": round(n_rays * spr / step_s),
        "vs_t4_samples": round(n_rays * spr / step_s / (56.78 * 262144), 2),
        "mfu_hw_pct": round(flops / step_s / peak * 100, 2) if peak else None,
        "mfu_useful_pct": (
            round(useful / step_s / peak * 100, 2) if peak else None
        ),
    }))
    trainer.close()


if __name__ == "__main__":
    main()
