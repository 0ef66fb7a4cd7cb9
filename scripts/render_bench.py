#!/usr/bin/env python3
"""Render-path benchmark: ms/frame + PSNR across chunk sizes and sample
budgets, from a trained checkpoint.

    python scripts/render_bench.py configs/machina_ngp.yml \
        --ckpt logs/machina-ngp/checkpoints \
        --sweep "48+48@131072,48+48@2097152,16+16@2097152"

Each sweep entry is nc+nf@chunksize(points). Prints one JSON line per entry
with render_ms, fps, and PSNR vs the dataset's first val view, plus the
PSNR delta vs the first (reference) entry's rendering.
"""

from __future__ import annotations

import argparse
import dataclasses
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
    ap.add_argument("--sweep", default="48+48@131072,48+48@4194304,"
                                       "32+32@4194304,16+16@4194304")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from nerf_kinematics_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from nerf_kinematics_tpu.io.checkpoint import CheckpointManager
    from nerf_kinematics_tpu.metrics.psnr import psnr
    from nerf_kinematics_tpu.train.config import load_config
    from nerf_kinematics_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    trainer = Trainer(cfg)
    state = trainer.engine.init_state(0)
    state, step = CheckpointManager(args.ckpt).restore(state)
    if state is None:
        raise SystemExit(f"no checkpoint under {args.ckpt}")
    print(f"restored step {step}", file=sys.stderr)

    ds = trainer.dataset
    vi = int(ds.val_idx[0])
    gt = ds.images[vi]
    vpose = jnp.asarray(ds.poses[vi])

    ref_img = None
    for entry in args.sweep.split(","):
        budget, _, chunk = entry.partition("@")
        nc, _, nf = budget.partition("+")
        nc, nf, chunk = int(nc), int(nf), int(chunk or 131072)
        val = dataclasses.replace(
            cfg.nerf.validation, num_coarse=nc, num_fine=nf, chunksize=chunk
        )
        ecfg = cfg.replace(nerf=dataclasses.replace(cfg.nerf, validation=val))
        engine = type(trainer.engine)(
            ecfg, scene_bound=trainer.engine.scene_bound
        ) if ecfg.engine == "ngp" else type(trainer.engine)(ecfg)
        render = engine.make_render_fn(ds.intrinsics, ds.near, ds.far, ds.use_ndc)
        out = render(eval_params(state), vpose, state.aux)
        img = np.asarray(out["rgb"])   # compile + sync
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = render(eval_params(state), vpose, state.aux)
            float(np.asarray(out["rgb"]).sum())   # host read = sync
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        if ref_img is None:
            ref_img = img
        print(json.dumps({
            "entry": entry, "render_ms": round(ms, 1),
            "fps": round(1e3 / ms, 1),
            "psnr_vs_gt": round(float(psnr(img, gt)), 2),
            "psnr_vs_ref_render": round(float(psnr(img, ref_img)), 2),
        }))


if __name__ == "__main__":
    main()
