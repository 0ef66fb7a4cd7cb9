#!/usr/bin/env python3
"""One-shot TPU benchmark battery: measures every engine/encoder variant in a
single process (the remote-TPU tunnel is flaky, so batch everything).

In-jit scan repetition separates kernel time from dispatch RTT:
time(scan N) ≈ RTT + N * t_step ⇒ t_step from two N values.
"""

import json
import time
import traceback

import jax
import jax.numpy as jnp


def timed_scan(fn, state, n_reps, *args):
    """Run fn n_reps times sequentially inside one jit; return total seconds."""
    @jax.jit
    def many(state):
        def body(c, _):
            c, m = fn(c, *args)
            return c, m["loss"]
        c, losses = jax.lax.scan(body, state, None, length=n_reps)
        return c, losses[-1]

    s, l = many(state)
    float(l)  # compile+run
    t0 = time.perf_counter()
    s, l = many(state)
    float(l)
    return time.perf_counter() - t0


def bench_engine(name, engine_factory, n_rays=4096, reps=(4, 16)):
    from nerf_kinematics_tpu.data import make_synthetic_scene

    try:
        ds = make_synthetic_scene(n_views=9, resolution=64)
        engine = engine_factory()
        state = engine.init_state(0)
        images, poses = jnp.asarray(ds.images), jnp.asarray(ds.poses)
        inner = engine.make_train_step(ds.intrinsics, ds.near, ds.far, False,
                                       donate=False)
        raw = inner.__wrapped__
        fn = lambda s: raw(s, images, poses)

        t_small = timed_scan(lambda c: fn(c), state, reps[0])
        t_big = timed_scan(lambda c: fn(c), state, reps[1])
        t_step = (t_big - t_small) / (reps[1] - reps[0])
        rays = n_rays / t_step
        print(f"{name}: {t_step*1e3:.1f} ms/step, {rays:,.0f} rays/s", flush=True)
        return {"step_ms": round(t_step * 1e3, 2), "rays_per_sec": round(rays)}
    except Exception as e:
        traceback.print_exc()
        return {"error": f"{type(e).__name__}: {e}"}


def main():
    from nerf_kinematics_tpu.models.flexible_nerf import FlexibleNeRFConfig
    from nerf_kinematics_tpu.models.ngp import NGPConfig
    from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import Config, NeRFConfig, OptimizerConfig
    from nerf_kinematics_tpu.train.loop import ClassicNerf
    from nerf_kinematics_tpu.train.ngp_engine import NGPEngine

    n_rays = 4096

    def nerf_cfg(**model_kw):
        return Config(
            model_coarse=FlexibleNeRFConfig(**model_kw),
            model_fine=FlexibleNeRFConfig(**model_kw),
            nerf=NeRFConfig(
                train=RenderSettings(num_coarse=64, num_fine=64, perturb=True,
                                     radiance_field_noise_std=0.2),
                validation=RenderSettings(num_coarse=64, num_fine=64, perturb=False),
                num_random_rays=n_rays,
            ),
            optimizer=OptimizerConfig(lr=5e-3),
        )

    def ngp_cfg(encoder, T=128, C=32, compute="bfloat16"):
        return Config(
            engine="ngp",
            ngp=NGPConfig(
                encoder=encoder,
                cp=CPGridConfig(n_levels=4, n_components=C, base_resolution=32,
                                max_resolution=512, table_size=T),
                compute_dtype=compute,
            ),
            nerf=NeRFConfig(
                train=RenderSettings(num_coarse=64, num_fine=64, perturb=True),
                validation=RenderSettings(num_coarse=64, num_fine=64, perturb=False),
                num_random_rays=n_rays,
            ),
            optimizer=OptimizerConfig(lr=1e-2),
        )

    results = {}
    results["classic_f32"] = bench_engine(
        "classic_f32", lambda: ClassicNerf(nerf_cfg()))
    results["classic_bf16"] = bench_engine(
        "classic_bf16", lambda: ClassicNerf(nerf_cfg(compute_dtype="bfloat16")))
    results["ngp_cp_xla"] = bench_engine(
        "ngp_cp_xla", lambda: NGPEngine(ngp_cfg("cp"), scene_bound=1.0))
    results["ngp_cp_pallas_T128"] = bench_engine(
        "ngp_cp_pallas_T128",
        lambda: NGPEngine(ngp_cfg("cp_pallas", T=128), scene_bound=1.0))
    results["ngp_cp_pallas_T256_C64"] = bench_engine(
        "ngp_cp_pallas_T256_C64",
        lambda: NGPEngine(ngp_cfg("cp_pallas", T=256, C=64), scene_bound=1.0))

    print(json.dumps(results, indent=2))
    with open("/tmp/tpu_bench_all.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
