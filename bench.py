#!/usr/bin/env python3
"""Benchmark: flagship-engine training throughput on the lego-class machina
workload (400x400, 100 views, white background), with honest accounting.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": R, ...extras}

Honest accounting (round-2 upgrades over the round-1 bench):
- The workload is the lego-class scene (cache/machina400, generated on
  demand), not a 64px toy — ray gather, the occupancy grid, and HBM are
  exercised at realistic scale, and the SAME config demonstrably reaches
  >25 dB (configs/machina_ngp.yml).
- ``vs_baseline`` compares SAMPLES/sec, the only unit the reference
  publishes unambiguously: instant-ngp trains 2^18 = 262,144 samples/step
  (its default batch, in samples — not rays) at 56.78 steps/s on the T4
  (instant_ngp_collab_cloud.ipynb cell 23) ⇒ 14.88M samples/s. The round-1
  conversion assumed 4096 rays/step, which understated the T4 by 2-4x.
- FLOPs are counted analytically from the model config (encoder + MLPs,
  fwd+bwd — utils/flops.py; XLA's cost_analysis undercounts scan bodies
  and Pallas custom calls); MFU = TFLOP/s / chip peak (bf16).
- time-to-25dB PSNR on this workload is measured by actually training,
  reported both including and excluding compile time.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from nerf_kinematics_tpu.train.loop import eval_params

# Reference T4 throughput in samples/s: 56.78 steps/s x 2^18 samples/step.
BASELINE_SAMPLES_PER_SEC = 56.78 * 262_144
# A100 bracket for the BASELINE.json north-star ("10x A100 rays/sec/chip").
# instant-ngp's throughput is mixed compute/gather-bound; A100/T4 ratios are
# ~4.8x on fp16 FLOPs (312/65 TFLOP/s) and ~4.9x on HBM bandwidth
# (1555/320 GB/s), so 5x the measured T4 number is the defensible estimate
# of the same workload on an A100 (no public instant-ngp A100 steps/s for
# this exact scene exists to cite).
A100_OVER_T4 = 5.0
# Known bf16 peaks per chip kind (TFLOP/s -> FLOP/s).
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}
DATASET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "cache", "machina400")
QUALITY_TARGET_DB = 25.0


def main() -> None:
    from nerf_kinematics_tpu.utils.backend_probe import probe_backend

    if not probe_backend():
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        print("bench: accelerator backend unreachable (probe timed out); "
              "falling back to CPU dev path", flush=True)

    from nerf_kinematics_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_kinematics_tpu.data import load_dataset
    from nerf_kinematics_tpu.data.machina import write_machina_dataset
    from nerf_kinematics_tpu.metrics.psnr import psnr
    from nerf_kinematics_tpu.train.config import load_config
    from nerf_kinematics_tpu.train.trainer import Trainer
    from nerf_kinematics_tpu.utils.flops import (
        train_step_flops,
        train_step_useful_flops,
    )

    on_tpu = jax.default_backend() == "tpu"

    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "configs", "machina_ngp.yml"))
    if on_tpu:
        write_machina_dataset(DATASET_DIR)  # idempotent (marker file)
        dataset = load_dataset(
            dataclasses.replace(cfg.dataset, basedir=DATASET_DIR),
            white_background=cfg.nerf.train.white_background,
        )
    else:
        # CPU/dev fallback: same code path, toy scale.
        from nerf_kinematics_tpu.data import make_synthetic_scene
        from nerf_kinematics_tpu.rendering.renderer import RenderSettings

        dataset = make_synthetic_scene(n_views=9, resolution=64)
        small = RenderSettings(num_coarse=16, num_fine=16, perturb=True)
        cfg = cfg.replace(nerf=dataclasses.replace(
            cfg.nerf, train=small,
            validation=dataclasses.replace(small, perturb=False),
            num_random_rays=512,
        ))

    trainer = Trainer(cfg.replace(
        experiment=dataclasses.replace(cfg.experiment, logdir="/tmp/bench_logs")
    ), dataset=dataset)
    engine = trainer.engine
    ds = trainer.dataset
    images, poses = trainer.images, trainer.poses
    n_rays = cfg.nerf.num_random_rays
    samples_per_ray = cfg.nerf.train.num_coarse + cfg.nerf.train.num_fine

    # ---- steady-state step time + measured FLOPs ----------------------
    # NOTE: two warm-up calls, then time the SUM of several calls — under
    # the remote-chip tunnel the first post-warmup call can report ready
    # before execution completes (donation aliasing), so single-call
    # timings are unreliable.
    state = engine.init_state(0)
    reps_small, reps_big = (8, 40) if on_tpu else (2, 6)
    timed_calls = 3
    times = {}
    flops_per_step = train_step_flops(cfg, n_rays)
    for n in (reps_small, reps_big):
        many = engine.make_train_many(ds.intrinsics, ds.near, ds.far,
                                      ds.use_ndc, steps_per_call=n)
        compiled = many.lower(state, images, poses, trainer.ray_buf).compile()
        s = state
        for _ in range(2):                       # warm-up (donates input)
            s, m = compiled(s, images, poses, trainer.ray_buf)
            float(m["loss"])                     # host read = real sync
        t0 = time.perf_counter()
        for _ in range(timed_calls):
            s, m = compiled(s, images, poses, trainer.ray_buf)
            # NOTE: jax.block_until_ready does NOT synchronize on the
            # experimental remote-chip platform; a host scalar read does.
            float(m["loss"])
        times[n] = (time.perf_counter() - t0) / timed_calls
        state = engine.init_state(0)             # fresh (previous donated)
    step_s = (times[reps_big] - times[reps_small]) / (reps_big - reps_small)

    n_chips = max(len(jax.devices()), 1)
    rays_per_sec = n_rays / step_s / n_chips
    samples_per_sec = rays_per_sec * samples_per_ray
    tflops = flops_per_step / step_s / 1e12 / n_chips

    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind)
    mfu_pct = (flops_per_step / step_s / peak * 100.0 / n_chips) if peak else None
    useful_flops_per_step = train_step_useful_flops(cfg, n_rays)
    mfu_useful_pct = (
        useful_flops_per_step / step_s / peak * 100.0 / n_chips
    ) if peak else None

    # ---- full-image render (serving/eval) throughput ------------------
    # Per-frame latency (sync per frame — includes the chip tunnel's
    # round trip) AND sustained pipelined throughput (dispatch a batch of
    # frames, sync once — the serving/video pattern).
    render_ms = None
    fast_ms = fast_sustained_ms = sustained_ms = None
    device_ms = fast_device_ms = None
    eval_ms = None
    if on_tpu:
        # Standard render pinned at 48+48 — the budget every previous
        # round's render row used — so the figure stays comparable after
        # the validation config moved to the denser 64+128 eval
        # quadrature (measured separately below as render_eval_*).
        val48 = dataclasses.replace(
            cfg.nerf.validation, num_coarse=48, num_fine=48
        )
        render = engine.make_render_fn(ds.intrinsics, ds.near, ds.far,
                                       ds.use_ndc, settings=val48)
        rpose = jnp.asarray(ds.poses[int(ds.val_idx[0])])
        rstate = engine.init_state(0)
        out = render(eval_params(rstate), rpose, rstate.aux)
        float(np.asarray(out["rgb"]).sum())          # compile + sync
        t0 = time.perf_counter()
        for _ in range(5):
            out = render(eval_params(rstate), rpose, rstate.aux)
            float(np.asarray(out["rgb"]).sum())      # host read = sync
        render_ms = (time.perf_counter() - t0) / 5 * 1e3
        t0 = time.perf_counter()
        outs = [render(eval_params(rstate), rpose, rstate.aux)["rgb"]
                for _ in range(16)]
        jax.block_until_ready(outs)
        float(np.asarray(outs[-1]).sum())
        sustained_ms = (time.perf_counter() - t0) / 16 * 1e3

        # Device-time fps: sync via an ON-DEVICE scalar reduction (4-byte
        # pull). The rows above sync by materializing a full frame on the
        # host — honest end-to-end through THIS dev tunnel (~32 MB/s D2H,
        # ~60 ms per 400² f32 frame) but ambient-load-noisy and
        # unrepresentative of a production host (PCIe D2H makes the
        # transfer negligible). This row is the stable chip figure.
        t0 = time.perf_counter()
        outs = [render(eval_params(rstate), rpose, rstate.aux)["rgb"]
                for _ in range(16)]
        float(jnp.sum(outs[-1]))
        device_ms = (time.perf_counter() - t0) / 16 * 1e3

        # The shipped eval budget (cfg.nerf.validation — 64+128 quadrature).
        render_eval = engine.make_render_fn(
            ds.intrinsics, ds.near, ds.far, ds.use_ndc
        )
        out = render_eval(eval_params(rstate), rpose, rstate.aux)
        float(np.asarray(out["rgb"]).sum())
        t0 = time.perf_counter()
        for _ in range(5):
            out = render_eval(eval_params(rstate), rpose, rstate.aux)
            float(np.asarray(out["rgb"]).sum())
        eval_ms = (time.perf_counter() - t0) / 5 * 1e3

        # Serving recipe measured on machina400 (scripts/
        # fast_render_bench.py, logs/sweeps/fast_render_fg_r3b.log):
        # contrast-scored foreground compaction at fg=0.35 with the saved
        # fine budget re-spent on depth (fine 48->64) renders +0.23 dB
        # OVER the standard render at ~1.6x its sustained fps (32 vs 19.8).
        from nerf_kinematics_tpu.rendering.fast_render import (
            FastRenderSettings,
        )

        # The serving recipe is pinned (48-coarse / 64-fine / fg 0.35) —
        # NOT inherited from cfg.nerf.validation, which is the *eval*
        # budget (now denser, 64+128 quadrature) and would silently change
        # this latency benchmark when eval quality knobs move.
        val = cfg.nerf.validation
        fast = engine.make_fast_render_fn(
            ds.intrinsics, ds.near, ds.far, ds.use_ndc,
            settings=FastRenderSettings(
                num_coarse=48,
                num_fine=64,
                fg_fraction=0.35,
                white_background=val.white_background,
            ),
        )
        out = fast(eval_params(rstate), rpose, rstate.aux)
        float(np.asarray(out["rgb"]).sum())
        t0 = time.perf_counter()
        for _ in range(5):
            out = fast(eval_params(rstate), rpose, rstate.aux)
            float(np.asarray(out["rgb"]).sum())
        fast_ms = (time.perf_counter() - t0) / 5 * 1e3
        t0 = time.perf_counter()
        outs = [fast(eval_params(rstate), rpose, rstate.aux)["rgb"]
                for _ in range(16)]
        jax.block_until_ready(outs)
        float(np.asarray(outs[-1]).sum())
        fast_sustained_ms = (time.perf_counter() - t0) / 16 * 1e3
        t0 = time.perf_counter()
        outs = [fast(eval_params(rstate), rpose, rstate.aux)["rgb"]
                for _ in range(16)]
        float(jnp.sum(outs[-1]))                 # device-side sync
        fast_device_ms = (time.perf_counter() - t0) / 16 * 1e3

    # ---- time-to-25dB on this workload (actually train) ---------------
    t25_incl = t25_post = None
    if on_tpu:
        chunk = 250
        many = engine.make_train_many(ds.intrinsics, ds.near, ds.far,
                                      ds.use_ndc, steps_per_call=chunk)
        render = engine.make_render_fn(ds.intrinsics, ds.near, ds.far, ds.use_ndc)
        vi = int(ds.val_idx[0])
        gt = ds.images[vi]
        vpose = jnp.asarray(ds.poses[vi])
        state = engine.init_state(0)
        t_start = time.perf_counter()
        t_post = None
        for it in range(1, 17):  # cap 4000 steps
            state, m = many(state, images, poses, trainer.ray_buf)
            state = engine.update_occupancy(state)
            val = float(psnr(np.asarray(render(eval_params(state), vpose,
                                                state.aux)["rgb"]), gt))
            if t_post is None:
                t_post = time.perf_counter()  # compile done inside 1st chunk
            if val >= QUALITY_TARGET_DB:
                now = time.perf_counter()
                t25_incl = now - t_start
                # Post-compile estimate: subtract first-chunk overhead beyond
                # the steady step time.
                t25_post = max(now - t_post, 0.0) + chunk * step_s
                break

    # ---- reference-resolution render rows (VERDICT r3 #3) -------------
    # The 400px rows above time an untrained state (comparable across
    # rounds). The block-compaction top-K and the VMEM budget both have
    # resolution-dependent behavior, so re-measure at 800x800 (4x the
    # pixels; the reference's fox frames are 1080x1920 — see
    # scripts/bigres_render_bench.py + logs/sweeps/bigres_render_r4.log
    # for that exact shape on the trained fox checkpoint) on the
    # 25dB-trained state from the loop above, including a fast-vs-standard
    # PSNR delta on identical weights.
    big = {}
    if on_tpu and t25_incl is not None:
        intr8 = ds.intrinsics.scaled(0.5)          # 400x400 -> 800x800
        render8 = engine.make_render_fn(intr8, ds.near, ds.far, ds.use_ndc,
                                        settings=val48)
        fast8 = engine.make_fast_render_fn(
            ds.intrinsics.scaled(0.5), ds.near, ds.far, ds.use_ndc,
            settings=FastRenderSettings(
                num_coarse=48, num_fine=64, fg_fraction=0.35,
                white_background=cfg.nerf.validation.white_background,
            ),
        )
        p = eval_params(state)
        std_img = np.asarray(render8(p, vpose, state.aux)["rgb"])
        fast_img = np.asarray(fast8(p, vpose, state.aux)["rgb"])
        big["render_fast_vs_std_psnr_800px"] = round(
            float(psnr(fast_img, std_img)), 2
        )
        for name, fn in (("render", render8), ("render_fast", fast8)):
            t0 = time.perf_counter()
            outs = [fn(p, vpose, state.aux)["rgb"] for _ in range(8)]
            jax.block_until_ready(outs)
            float(np.asarray(outs[-1]).sum())
            big[f"{name}_fps_800px_sustained"] = round(
                8e3 / ((time.perf_counter() - t0) * 1e3), 1
            )
            t0 = time.perf_counter()
            outs = [fn(p, vpose, state.aux)["rgb"] for _ in range(8)]
            float(jnp.sum(outs[-1]))             # device-side sync
            big[f"{name}_fps_800px_device"] = round(
                8e3 / ((time.perf_counter() - t0) * 1e3), 1
            )

        # 1080p-class serving row (VERDICT r4 #5): a 1440² frame carries
        # the same 2.07M pixels as the reference's 1080×1920 fox frames
        # (cell 30). Recipe from the round-5 fox operating-curve sweep
        # (scripts/bigres_render_bench.py --sweep,
        # logs/sweeps/bigres_render_r5.log).
        intr14 = ds.intrinsics.scaled(400.0 / 1440.0)  # 400² → 1440²
        fast14 = engine.make_fast_render_fn(
            intr14, ds.near, ds.far, ds.use_ndc,
            settings=FastRenderSettings(
                num_coarse=48, num_fine=48, fg_fraction=0.2,
                white_background=cfg.nerf.validation.white_background,
            ),
        )
        std14 = engine.make_render_fn(intr14, ds.near, ds.far, ds.use_ndc,
                                      settings=val48)
        fast_img = np.asarray(fast14(p, vpose, state.aux)["rgb"])
        std_img = np.asarray(std14(p, vpose, state.aux)["rgb"])
        big["render_fast_vs_std_psnr_1080p_eq"] = round(
            float(psnr(fast_img, std_img)), 2
        )
        t0 = time.perf_counter()
        outs = [fast14(p, vpose, state.aux)["rgb"] for _ in range(8)]
        float(jnp.sum(outs[-1]))                 # device-side sync
        big["render_fast_fps_1080p_eq_device"] = round(
            8e3 / ((time.perf_counter() - t0) * 1e3), 1
        )

    out = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        # samples_per_sec is ALREADY per chip (rays_per_sec divides by
        # n_chips above) — do not divide again.
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
        "samples_per_sec_per_chip": round(samples_per_sec, 0),
        "samples_per_ray": samples_per_ray,
        "step_ms": round(step_s * 1e3, 3),
        "analytic_tflops_per_chip": round(tflops, 2),
        # Hardware MFU: executed FLOPs (incl. the encoder's structurally
        # sparse two-hot matmuls) vs chip peak — are the MXUs busy?
        "mfu_hw_pct": round(mfu_pct, 2) if mfu_pct is not None else None,
        # Useful MFU: algorithmic FLOPs only (encoder counted at its two
        # touched rows per level-axis, the gather-implementation cost) —
        # how much of the chip does the ALGORITHM actually need? The gap is
        # optimization headroom, not achievement.
        "mfu_useful_pct": (
            round(mfu_useful_pct, 2) if mfu_useful_pct is not None else None
        ),
        "vs_t4": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
        # Position vs the BASELINE.json north-star (10x A100 rays/sec/chip):
        # A100 estimated at 5x the T4's published steps/s (see A100_OVER_T4).
        "vs_a100_est": round(
            samples_per_sec / (A100_OVER_T4 * BASELINE_SAMPLES_PER_SEC), 3
        ),
        "device_kind": kind,
        "workload": "machina400 (lego-class, 400x400, 100 views)" if on_tpu
                    else "synthetic64 (dev fallback)",
        "baseline_derivation": "T4 56.78 steps/s x 2^18 samples/step "
                               "= 14.88M samples/s (cell 23); ratio in samples/s",
        "time_to_25db_s": round(t25_incl, 1) if t25_incl else None,
        "time_to_25db_post_compile_s": round(t25_post, 1) if t25_post else None,
        "render_ms_per_frame_400px": round(render_ms, 1) if render_ms else None,
        "render_fps_400px": round(1e3 / render_ms, 1) if render_ms else None,
        "render_fps_400px_sustained": (
            round(1e3 / sustained_ms, 1) if sustained_ms else None
        ),
        "render_fast_ms_per_frame_400px": (
            round(fast_ms, 1) if fast_ms else None
        ),
        "render_fast_fps_400px": round(1e3 / fast_ms, 1) if fast_ms else None,
        "render_fast_fps_400px_sustained": (
            round(1e3 / fast_sustained_ms, 1) if fast_sustained_ms else None
        ),
        # The shipped eval budget (64+128 quadrature) — denser and slower
        # than the pinned-48+48 render rows above by design.
        "render_eval_ms_per_frame_400px": (
            round(eval_ms, 1) if eval_ms else None
        ),
        "render_eval_fps_400px": round(1e3 / eval_ms, 1) if eval_ms else None,
        # Device-time fps (on-device scalar sync): the stable chip figure,
        # free of the dev tunnel's ~32 MB/s frame-download cost that the
        # rows above include.
        "render_fps_400px_device": (
            round(1e3 / device_ms, 1) if device_ms else None
        ),
        "render_fast_fps_400px_device": (
            round(1e3 / fast_device_ms, 1) if fast_device_ms else None
        ),
        **big,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
