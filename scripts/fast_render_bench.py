#!/usr/bin/env python3
"""Measure the serving-rate fast-render path vs the standard renderer on a
trained checkpoint: per-frame latency, pipelined sustained fps, and PSNR
(vs GT and vs the standard full-budget render).

    python scripts/fast_render_bench.py configs/machina_ngp.yml \
        --ckpt logs/machina-ngp/checkpoints [--stride 2] [--fine 48]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from nerf_kinematics_tpu.train.loop import eval_params

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--coarse", type=int, default=None)
    ap.add_argument("--fine", type=int, default=None)
    ap.add_argument("--no-blur", action="store_true")
    ap.add_argument("--fg", type=float, default=1.0,
                    help="fg_fraction: top-K opaque blocks get the fine pass")
    ap.add_argument("--frames", type=int, default=24)
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
    from nerf_kinematics_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    trainer = Trainer(cfg)
    state = trainer.engine.init_state(0)
    state, step = CheckpointManager(args.ckpt).restore(state)
    if state is None:
        raise SystemExit(f"no checkpoint found under {args.ckpt}")
    print(f"restored step {step}", file=sys.stderr)
    ds = trainer.dataset
    vi = int(ds.val_idx[0])
    gt = ds.images[vi]
    pose = jnp.asarray(ds.poses[vi])
    poses = [jnp.asarray(ds.poses[int(i)]) for i in ds.val_idx]

    def measure(render):
        img = np.asarray(render(eval_params(state), pose, state.aux)["rgb"])
        t0 = time.perf_counter()
        for _ in range(5):
            float(np.asarray(
                render(eval_params(state), pose, state.aux)["rgb"]).sum())
        latency = (time.perf_counter() - t0) / 5 * 1e3
        t0 = time.perf_counter()
        outs = [render(eval_params(state), poses[i % len(poses)], state.aux)["rgb"]
                for i in range(args.frames)]
        jax.block_until_ready(outs)
        float(np.asarray(outs[-1]).sum())
        sustained = (time.perf_counter() - t0) / args.frames * 1e3
        return img, latency, sustained

    std = trainer.engine.make_render_fn(ds.intrinsics, ds.near, ds.far,
                                        ds.use_ndc)
    img_std, lat_std, sus_std = measure(std)

    val = cfg.nerf.validation
    fs = FastRenderSettings(
        num_coarse=args.coarse or val.num_coarse,
        num_fine=args.fine or val.num_fine or val.num_coarse,
        stride=args.stride,
        pdf_blur=not args.no_blur,
        fg_fraction=args.fg,
        white_background=val.white_background,
    )
    fast = trainer.engine.make_fast_render_fn(
        ds.intrinsics, ds.near, ds.far, ds.use_ndc, settings=fs
    )
    img_fast, lat_fast, sus_fast = measure(fast)

    print(json.dumps({
        "std_ms": round(lat_std, 1), "std_sustained_ms": round(sus_std, 1),
        "std_fps_sustained": round(1e3 / sus_std, 1),
        "std_psnr_gt": round(float(psnr(img_std, gt)), 2),
        "fast_ms": round(lat_fast, 1),
        "fast_sustained_ms": round(sus_fast, 1),
        "fast_fps_sustained": round(1e3 / sus_fast, 1),
        "fast_psnr_gt": round(float(psnr(img_fast, gt)), 2),
        "fast_vs_std_psnr": round(float(psnr(img_fast, img_std)), 2),
        "settings": {"stride": fs.stride, "coarse": fs.num_coarse,
                     "fine": fs.num_fine, "blur": fs.pdf_blur,
                     "fg": fs.fg_fraction},
    }))


if __name__ == "__main__":
    main()
