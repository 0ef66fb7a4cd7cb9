#!/usr/bin/env python3
"""Serving-render bench at the reference's native resolution (VERDICT r3 #3).

The reference's render flow operated on 1080x1920 fox frames
(`instant_ngp_collab_cloud.ipynb` cell 30); all prior render benches here
were 400x400 machina. This script loads a trained checkpoint and measures
the standard (48+48) and fast (block-compaction serving) renderers at the
dataset's FULL resolution: sustained + device-sync fps, plus the fast path's
PSNR against the standard render AND against the GT val frame.

    python scripts/bigres_render_bench.py configs/fox_ngp.yml \
        --ckpt logs/fox-ngp/checkpoints [--fg 0.35] [--fine 64]

Appends one JSON line to logs/sweeps/bigres_render_r4.log by default.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--fg", type=float, default=0.35)
    ap.add_argument("--fine", type=int, default=64)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--out", default="logs/sweeps/bigres_render_r4.log")
    ap.add_argument("--sweep", action="store_true",
                    help="run the round-5 (fg x fine) operating-curve grid "
                         "instead of the single (--fg, --fine) cell")
    args = ap.parse_args()

    from nerf_kinematics_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_kinematics_tpu.io.checkpoint import CheckpointManager
    from nerf_kinematics_tpu.metrics.psnr import psnr
    from nerf_kinematics_tpu.rendering.fast_render import FastRenderSettings
    from nerf_kinematics_tpu.train.config import load_config
    from nerf_kinematics_tpu.train.loop import eval_params
    from nerf_kinematics_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    trainer = Trainer(cfg)
    engine, ds = trainer.engine, trainer.dataset
    state = engine.init_state(0)
    state, step = CheckpointManager(os.path.abspath(args.ckpt)).restore(state)
    if state is None:
        raise SystemExit(f"no checkpoint under {args.ckpt}")
    # The loop never checkpoints aux (occupancy grid is derived state) —
    # rebuild it from the restored weights so the proposal is live.
    state = engine.update_occupancy(state, full=True)

    intr = ds.intrinsics
    H, W = intr.height, intr.width
    vi = int(ds.val_idx[0])
    gt = np.asarray(ds.images[vi])
    vpose = jnp.asarray(ds.poses[vi])
    p = eval_params(state)

    val48 = dataclasses.replace(cfg.nerf.validation, num_coarse=48,
                                num_fine=48)
    render = engine.make_render_fn(intr, ds.near, ds.far, ds.use_ndc,
                                   settings=val48)
    std_img = np.asarray(render(p, vpose, state.aux)["rgb"])
    std_gt = round(float(psnr(std_img, gt)), 2)

    t0 = time.perf_counter()
    outs = [render(p, vpose, state.aux)["rgb"] for _ in range(args.reps)]
    float(jnp.sum(outs[-1]))
    std_fps_device = round(args.reps / (time.perf_counter() - t0), 2)

    cells = ([(args.fg, args.fine)] if not args.sweep else
             [(0.35, 64), (0.2, 48), (0.15, 48), (0.2, 32), (0.15, 32),
              (0.1, 48)])
    for fg, fine in cells:
        fast = engine.make_fast_render_fn(
            intr, ds.near, ds.far, ds.use_ndc,
            settings=FastRenderSettings(
                num_coarse=48, num_fine=fine, fg_fraction=fg,
                white_background=cfg.nerf.validation.white_background,
            ),
        )
        res = {"config": args.config, "ckpt_step": int(step),
               "resolution": f"{H}x{W}", "fg": fg, "fine": fine,
               "std_vs_gt_psnr": std_gt, "std_fps_device": std_fps_device}
        fast_img = np.asarray(fast(p, vpose, state.aux)["rgb"])
        res["fast_vs_gt_psnr"] = round(float(psnr(fast_img, gt)), 2)
        res["fast_vs_std_psnr"] = round(float(psnr(fast_img, std_img)), 2)

        t0 = time.perf_counter()
        outs = [fast(p, vpose, state.aux)["rgb"] for _ in range(args.reps)]
        jax.block_until_ready(outs)
        float(np.asarray(outs[-1]).sum())
        res["fast_fps_sustained"] = round(
            args.reps / (time.perf_counter() - t0), 2)
        t0 = time.perf_counter()
        outs = [fast(p, vpose, state.aux)["rgb"] for _ in range(args.reps)]
        float(jnp.sum(outs[-1]))                    # device-side sync
        res["fast_fps_device"] = round(
            args.reps / (time.perf_counter() - t0), 2)

        line = json.dumps(res)
        print(line, flush=True)
        if args.out:
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
