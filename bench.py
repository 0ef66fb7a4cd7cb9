#!/usr/bin/env python3
"""Benchmark: training throughput in rays/sec/chip on the flagship engine.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec_per_chip", "value": N, "unit": "rays/s", "vs_baseline": R}

Baseline: the reference's Instant-NGP training on a Tesla T4 ran 56.78 steps/s
(instant_ngp_collab_cloud.ipynb cell 23) at the default 4096-ray batch ⇒
~232,570 rays/s. ``vs_baseline`` is our rays/s divided by that.

Runs on whatever jax.devices() provides (the real TPU chip under the driver).
"""

from __future__ import annotations

import json
import time

BASELINE_RAYS_PER_SEC = 56.78 * 4096  # reference T4 throughput


def main() -> None:
    import jax
    import jax.numpy as jnp

    from nerf_kinematics_tpu.data import make_synthetic_scene
    from nerf_kinematics_tpu.models.flexible_nerf import FlexibleNeRFConfig
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import Config, NeRFConfig, OptimizerConfig
    from nerf_kinematics_tpu.train.loop import ClassicNerf

    n_rays = 4096
    cfg = Config(
        model_coarse=FlexibleNeRFConfig(),
        model_fine=FlexibleNeRFConfig(),
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=64, num_fine=64, perturb=True,
                                 radiance_field_noise_std=0.2),
            validation=RenderSettings(num_coarse=64, num_fine=64, perturb=False),
            num_random_rays=n_rays,
        ),
        optimizer=OptimizerConfig(lr=5e-3),
    )

    ds = make_synthetic_scene(n_views=9, resolution=64)
    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)

    engine = ClassicNerf(cfg)
    state = engine.init_state(0)
    steps_per_call = 20
    step = engine.make_train_many(
        ds.intrinsics, ds.near, ds.far, False, steps_per_call=steps_per_call
    )

    # Warmup / compile.
    state, metrics = step(state, images, poses)
    jax.block_until_ready(metrics["loss"])

    calls = 5
    t0 = time.perf_counter()
    for _ in range(calls):
        state, metrics = step(state, images, poses)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    iters = calls * steps_per_call

    n_chips = len(jax.devices())
    rays_per_sec = iters * n_rays / dt / max(n_chips, 1)
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
