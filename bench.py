#!/usr/bin/env python3
"""Benchmark: training throughput in rays/sec/chip on the flagship engine.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec_per_chip", "value": N, "unit": "rays/s", "vs_baseline": R}

Baseline: the reference's Instant-NGP training on a Tesla T4 ran 56.78 steps/s
(instant_ngp_collab_cloud.ipynb cell 23) at the default 4096-ray batch ⇒
~232,570 rays/s. ``vs_baseline`` is our rays/s divided by that.

Flagship configuration: NGP-class engine with the folded CP Pallas encoder
(bf16 MLPs), occupancy-guided single-pass sampling at 32 samples/ray — the
TPU-native equivalent of instant-ngp's occupancy-pruned marching, which also
lands near ~32 effective samples/ray (ARCHITECTURE.md §3-4; quality at this
setting: 38.8 dB on the synthetic scene @2k steps, vs 40.7 dB at 64 samples).
Timing uses in-jit lax.scan repetition so host/tunnel dispatch latency is
excluded (steady-state step time).
"""

from __future__ import annotations

import json
import time

BASELINE_RAYS_PER_SEC = 56.78 * 4096  # reference T4 throughput


def main() -> None:
    import jax
    import jax.numpy as jnp

    from nerf_kinematics_tpu.data import make_synthetic_scene
    from nerf_kinematics_tpu.models.ngp import NGPConfig
    from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import Config, NeRFConfig, OptimizerConfig
    from nerf_kinematics_tpu.train.ngp_engine import NGPEngine

    n_rays = 4096
    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        engine="ngp",
        ngp=NGPConfig(
            encoder="cp_pallas" if on_tpu else "cp",
            cp=CPGridConfig(n_levels=4, n_components=32, base_resolution=32,
                            max_resolution=512, table_size=128),
            compute_dtype="bfloat16",
            use_occupancy=True, occ_resolution=96, occ_update_every=256,
        ),
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=32, num_fine=0, perturb=True),
            validation=RenderSettings(num_coarse=32, num_fine=0, perturb=False),
            num_random_rays=n_rays,
        ),
        optimizer=OptimizerConfig(lr=1e-2),
    )

    ds = make_synthetic_scene(n_views=9, resolution=64)
    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)

    engine = NGPEngine(cfg, scene_bound=1.0)
    state = engine.init_state(0)
    raw = engine.make_train_step(
        ds.intrinsics, ds.near, ds.far, False, donate=False
    ).__wrapped__

    def make_many(n):
        @jax.jit
        def many(s):
            def body(c, _):
                c, m = raw(c, images, poses)
                return c, m["loss"]

            c, losses = jax.lax.scan(body, s, None, length=n)
            return c, losses[-1]

        return many

    reps_small, reps_big = (2, 8) if not on_tpu else (8, 40)
    t = {}
    for n in (reps_small, reps_big):
        many = make_many(n)
        s, l = many(state)
        float(l)  # compile + run
        t0 = time.perf_counter()
        s, l = many(state)
        float(l)
        t[n] = time.perf_counter() - t0
    step_s = (t[reps_big] - t[reps_small]) / (reps_big - reps_small)

    n_chips = len(jax.devices())
    rays_per_sec = n_rays / step_s / max(n_chips, 1)
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
