#!/usr/bin/env python3
"""Component-level profiling of the NGP training step on the machina config.

Times each layer of the step in isolation with dispatch-corrected in-jit
scans (one lax.scan of N iterations per measurement, host-scalar read as the
sync point — single-call timings are unreliable over the remote-chip
tunnel). Prints a table: full step, model fwd+bwd (encoder+MLPs), encoder
fwd+bwd alone, encoder fwd alone, MLP-only fwd+bwd, optimizer update, and
the residual (sampling + compositing + ray gen).

Usage: python scripts/profile_step.py [--rays 8192] [--samples 96]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed_scan(fn, n=100, reps=3):
    """Steady-state seconds per call of ``fn(eps)`` via an n-iteration scan.

    ``fn`` MUST mix the per-iteration scalar ``eps`` into its inputs (e.g.
    ``pts + eps``): a loop-invariant body gets hoisted out of the scan by
    XLA and the measurement collapses to the cost of one iteration.

    The whole program costs one host↔device round trip (~25 ms through the
    remote-chip tunnel), which adds a constant/n floor to every figure —
    at the old n=20 that was a ~1.3 ms/iter bias that made a ~30 µs
    optimizer update read as "1.4 ms". n=100 bounds the bias at ~0.3 ms;
    main() additionally measures and prints the floor so readers can
    subtract it.
    """
    import jax
    import jax.numpy as jnp

    def body(carry, eps):
        out = fn(eps + carry * 0.0)
        # Fold output into carry so nothing is DCE'd and the next iteration
        # depends on this one.
        s = jax.tree_util.tree_reduce(
            lambda a, x: a + x.astype("float32").sum(), out, 0.0
        )
        return carry + s * 1e-30, None

    @jax.jit
    def run():
        eps = jnp.zeros((n,), jnp.float32)
        tot, _ = jax.lax.scan(body, 0.0, eps)
        return tot

    float(run())  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run())
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--coarse", type=int, default=48)
    ap.add_argument("--fine", type=int, default=48)
    ap.add_argument("--fused", default=None, choices=["auto", "on", "off"],
                    help="override ngp.fused for A/B")
    ap.add_argument("--fused-train", default=None,
                    choices=["auto", "on", "off", "fine"],
                    help="override ngp.fused_train for A/B")
    ap.add_argument("--fold", default=None, choices=["periodic", "hash"])
    ap.add_argument("--table", type=int, default=None)
    ap.add_argument("--quick", action="store_true",
                    help="only measure the full train step, then exit")
    ap.add_argument("--fused-block", type=int, default=None,
                    help="override ngp.fused_block for A/B")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_kinematics_tpu.data import make_synthetic_scene
    from nerf_kinematics_tpu.models.ngp import NGPModel
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import load_config
    from nerf_kinematics_tpu.train.trainer import Trainer
    from nerf_kinematics_tpu.utils.flops import train_step_flops

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_config(os.path.join(root, "configs", "machina_ngp.yml"))
    rs = dataclasses.replace(cfg.nerf.train, num_coarse=args.coarse,
                             num_fine=args.fine)
    cfg = cfg.replace(nerf=dataclasses.replace(
        cfg.nerf, train=rs,
        validation=dataclasses.replace(rs, perturb=False),
        num_random_rays=args.rays,
    ), experiment=dataclasses.replace(cfg.experiment, logdir="/tmp/prof_logs"))
    if args.fused:
        cfg = cfg.replace(ngp=dataclasses.replace(cfg.ngp, fused=args.fused))
    if args.fused_train:
        cfg = cfg.replace(ngp=dataclasses.replace(
            cfg.ngp, fused_train=args.fused_train))
    if args.fused_block is not None:
        cfg = cfg.replace(ngp=dataclasses.replace(
            cfg.ngp, fused_block=args.fused_block))
    if args.fold or args.table:
        cp = dataclasses.replace(
            cfg.ngp.cp,
            **({"fold": args.fold} if args.fold else {}),
            **({"table_size": args.table} if args.table else {}),
        )
        cfg = cfg.replace(ngp=dataclasses.replace(cfg.ngp, cp=cp))

    ds = make_synthetic_scene(n_views=12, resolution=100)
    trainer = Trainer(cfg, dataset=ds)
    engine = trainer.engine
    state = engine.init_state(0)
    images, poses = trainer.images, trainer.poses

    n_pts = args.rays * (args.coarse + args.fine)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (n_pts, 3))
    dirs = jax.random.normal(key, (n_pts, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    params = state.params

    model: NGPModel = engine.model
    ngp = engine.ngp_config

    # Round-trip floor: a near-free body measured through the same scan.
    # Every figure below carries roughly this additive bias.
    floor_probe = jnp.zeros((1024,), jnp.float32)
    t_floor = timed_scan(lambda e: floor_probe + e)
    print(f"  [floor] scan round-trip bias  {t_floor*1e3:8.3f} ms/iter "
          "(additive in every row below)", flush=True)

    def measure(name, fn):
        t = timed_scan(fn)
        print(f"  [measured] {name:28s} {t*1e3:8.2f} ms", flush=True)
        return t

    # --- full train step --------------------------------------------------
    raw_step = engine._build_train_step(ds.intrinsics, ds.near, ds.far, False)
    ray_buf = None
    if cfg.nerf.train.pixel_sampler == "shuffled":
        from nerf_kinematics_tpu.train.loop import build_shuffled_ray_buffer

        ray_buf = build_shuffled_ray_buffer(
            images, poses, ds.intrinsics, seed=0
        )
    t_step = measure("full train step",
                     lambda e: raw_step(state, images + e, poses, ray_buf))
    if args.quick:
        print(f"  step (floor-corrected): {(t_step - t_floor)*1e3:.3f} ms")
        return

    # --- model fwd+bwd (engine dispatch: fused or unfused) ----------------
    def model_loss(p, e):
        rgb, sigma = engine.apply_coarse(p, pts + e, dirs)
        return (rgb.astype(jnp.float32).sum() + sigma.sum()) / n_pts

    g_model = jax.grad(model_loss)
    t_model_fb = measure("model fwd+bwd",
                         lambda e: g_model(params["coarse"], e))
    t_model_f = measure("model fwd",
                        lambda e: model_loss(params["coarse"], e))

    # --- encoder alone -----------------------------------------------------
    def enc_loss(p, e):
        h = model.apply(p, engine._to_unit(pts + e), method=NGPModel.encode)
        return h.astype(jnp.float32).sum() / n_pts

    g_enc = jax.grad(enc_loss)
    t_enc_fb = measure("encoder fwd+bwd",
                       lambda e: g_enc(params["coarse"], e))
    t_enc_f = measure("encoder fwd",
                      lambda e: enc_loss(params["coarse"], e))

    # --- optimizer ----------------------------------------------------------
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    t_opt = measure(
        "optimizer update",
        lambda e: engine.optimizer.update(
            jax.tree_util.tree_map(lambda z: z + e, zeros),
            state.opt_state, params,
        )[0],
    )

    # --- render machinery: full render_rays loss fwd+bwd vs model only ----
    from nerf_kinematics_tpu.rendering.renderer import render_rays

    n_rays = args.rays
    key = jax.random.PRNGKey(7)
    rays_o = jnp.zeros((n_rays, 3))
    rd = jax.random.normal(key, (n_rays, 3))
    rays_d = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    tgt = jax.random.uniform(key, (n_rays, 3))
    # The engine's *actual* train settings (NGP forces merge_hierarchical
    # False), not the raw config (merge True would evaluate 2x fine points).
    settings = engine.cfg.nerf.train
    aux = state.aux

    # Batch sampling alone (pixel gather + ray gen), straight from the step.
    raw_step_fns = engine._build_train_step(ds.intrinsics, ds.near, ds.far,
                                            False)
    import nerf_kinematics_tpu.train.loop as loop_mod  # noqa: F401

    def batch_only(e):
        # Reproduce sample_batch's work via a tiny jitted closure: random
        # pixels + ray directions, summed.
        k = jax.random.PRNGKey(0)
        k_img, k_row, k_col = jax.random.split(k, 3)
        H = ds.intrinsics.height
        Wd = ds.intrinsics.width
        n_img = images.shape[0]
        img = jax.random.randint(k_img, (n_rays,), 0, n_img)
        row = jax.random.randint(k_row, (n_rays,), 0, H)
        col = jax.random.randint(k_col, (n_rays,), 0, Wd)
        target = (images + e)[img, row, col]
        c2w = poses[img]
        return target.sum() + c2w.sum()

    measure("pixel gather + pose gather", batch_only)

    def render_loss(p, e):
        coarse, fine = render_rays(
            p["coarse"], engine.apply_coarse, rays_o, rays_d + e,
            ds.near, ds.far, settings, key=key,
            params_fine=None, apply_fine=engine.apply_fine,
            use_viewdirs=True, viewdirs=rays_d,
            proposal_fn=engine.proposal_for(aux, ds.near, ds.far, settings),
        )
        out = fine if fine is not None else coarse
        return jnp.mean((out.rgb - tgt) ** 2)

    g_render = jax.grad(render_loss)
    measure("render_rays loss fwd+bwd", lambda e: g_render(params, e))
    measure("render_rays loss fwd", lambda e: render_loss(params, e))

    # occupancy proposal alone
    prop = engine.proposal_for(aux, ds.near, ds.far, settings)
    if prop is not None:
        measure("occupancy proposal (48)",
                lambda e: prop(key, rays_o, rays_d + e))

    # hierarchical sample_pdf alone (48 bins -> 48 samples)
    from nerf_kinematics_tpu.ops.sampling import sample_pdf

    bins = jnp.broadcast_to(
        jnp.linspace(ds.near, ds.far, settings.num_coarse + 1),
        (n_rays, settings.num_coarse + 1),
    )
    w = jax.random.uniform(key, (n_rays, settings.num_coarse))
    measure("sample_pdf fine",
            lambda e: sample_pdf(key, bins, w + e, settings.num_fine,
                                 stratified_u=True))

    flops = train_step_flops(cfg, args.rays)
    print(f"\nconfig: {args.rays} rays x {args.coarse}+{args.fine} samples "
          f"= {n_pts} pts; analytic {flops/1e9:.2f} GFLOP/step")
    # Subtract the measured scan round-trip floor from each direct
    # measurement (derived differences cancel it already).
    f = t_floor
    rows = [
        ("full train step", t_step - f),
        ("model fwd+bwd", t_model_fb - f),
        ("model fwd", t_model_f - f),
        # NB: the encoder rows time NGPModel.encode — the UNFUSED encoder.
        # On the fused path the encoder runs inside the single Pallas
        # kernel timed by "model fwd+bwd"; these rows bound what the
        # encoder costs standalone, they do not decompose the fused kernel
        # (which is why encoder-alone can exceed model fwd+bwd).
        ("encoder fwd+bwd (unfused)", t_enc_fb - f),
        ("encoder fwd (unfused)", t_enc_f - f),
        ("optimizer update", t_opt - f),
        ("sampling/compositing/rest", t_step - t_model_fb - (t_opt - f)),
    ]
    print(f"  (floor-corrected: scan bias {f*1e3:.3f} ms subtracted "
          "from direct rows)")
    for name, t in rows:
        t = max(t, 1e-9)
        print(f"  {name:28s} {t*1e3:8.2f} ms  "
              f"({args.rays/t/1e3:7.0f} krays/s equiv)")
    t_real = max(t_step - f, 1e-9)
    print(f"  step throughput: {args.rays/t_real/1e3:.0f} krays/s, "
          f"{n_pts/t_real/1e6:.1f} M samples/s")


if __name__ == "__main__":
    main()
