#!/usr/bin/env python3
"""Time-to-quality tracker: train the fast engine on the synthetic scene and
report wall-clock time to PSNR milestones (the BASELINE.json
"time-to-25dB tracked" north-star; run on TPU).

    python scripts/time_to_quality.py --target 25 --resolution 64
"""

import argparse
import json
import time
from nerf_kinematics_tpu.train.loop import eval_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=float, default=25.0)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--max-steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--encoder", default="cp", choices=["cp", "cp_pallas", "hash"])
    ap.add_argument("--eval-every", type=int, default=250)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from nerf_kinematics_tpu.data import make_synthetic_scene
    from nerf_kinematics_tpu.metrics.psnr import psnr
    from nerf_kinematics_tpu.models.ngp import NGPConfig
    from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import (
        Config, NeRFConfig, OptimizerConfig, SchedulerConfig,
    )
    from nerf_kinematics_tpu.train.ngp_engine import NGPEngine

    ds = make_synthetic_scene(n_views=15, resolution=args.resolution)
    cfg = Config(
        engine="ngp",
        ngp=NGPConfig(
            encoder=args.encoder,
            cp=CPGridConfig(n_levels=4, n_components=32, base_resolution=32,
                            max_resolution=512, table_size=128),
            compute_dtype="bfloat16",
        ),
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=64, num_fine=64, perturb=True),
            validation=RenderSettings(num_coarse=64, num_fine=64, perturb=False),
            num_random_rays=args.batch,
        ),
        optimizer=OptimizerConfig(lr=1e-2),
        scheduler=SchedulerConfig(lr_decay=20, lr_decay_factor=0.33),
    )
    engine = NGPEngine(cfg, scene_bound=1.0)
    state = engine.init_state(0)
    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far, False, donate=True)
    render = engine.make_render_fn(ds.intrinsics, ds.near, ds.far, False)
    imgs, poses = jnp.asarray(ds.images), jnp.asarray(ds.poses)

    # Warm up compile outside the timed region.
    state, m = step(state, imgs, poses)
    float(m["loss"])

    milestones = {}
    t0 = time.perf_counter()
    for it in range(1, args.max_steps + 1):
        state, m = step(state, imgs, poses)
        if it % args.eval_every == 0:
            i = int(ds.val_idx[0])
            pred = np.asarray(render(eval_params(state), poses[i])["rgb"])
            p = psnr(pred, ds.images[i])
            t = time.perf_counter() - t0
            print(f"step {it}: val_psnr {p:.2f} dB @ {t:.1f}s", flush=True)
            for mark in (20, 22, 25, 28, 30):
                if p >= mark and mark not in milestones:
                    milestones[mark] = {"seconds": round(t, 1), "step": it}
            if p >= args.target:
                break

    print(json.dumps({"milestones": milestones, "target": args.target}))


if __name__ == "__main__":
    main()
