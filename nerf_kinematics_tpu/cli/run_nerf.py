"""CLI: train/evaluate the classic-NeRF engine from a YAML config.

Reference-compatible invocation (README.md:92, BASELINE.json config 1):

    python run_nerf.py --config configs/lego.yml

Extra subcommand-style flags:
    --eval            render + PSNR the validation split from latest checkpoint
    --render-video    render the dataset's novel-view path to PNGs
    --max-iters N     override experiment.train_iters (smoke runs)
    --mesh            enable multi-device data parallelism over the ray batch
    --export-legacy   also write torch-layout checkpoint{iter}.ckpt files
"""

from __future__ import annotations

import argparse
import os

from ..train.loop import eval_params


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train/evaluate classic NeRF (TPU-native)")
    p.add_argument("--config", required=True, help="Path to YAML config (reference schema)")
    p.add_argument("--eval", action="store_true", help="Evaluate instead of train")
    p.add_argument("--render-video", action="store_true", help="Render novel-view path")
    p.add_argument("--fast", action="store_true",
                   help="serving-rate fast renderer for --render-video "
                        "(NGP engine: block-shared coarse pass + foreground "
                        "compaction; writes video.mp4 and reports fps)")
    p.add_argument("--fast-fg", type=float, default=0.35,
                   help="--fast: fraction of 2x2 blocks (by coarse-composite "
                        "contrast) that get the fine pass. Default 0.35 is "
                        "the iso-PSNR recipe measured on machina400; raise "
                        "it (up to 1.0) for scenes whose subject fills the "
                        "frame")
    p.add_argument("--fast-fine", type=int, default=64,
                   help="--fast: fine samples per ray (default 64: the "
                        "compaction savings re-spent on depth)")
    p.add_argument("--load-checkpoint", default=None, help="Checkpoint step or legacy .ckpt path")
    p.add_argument("--max-iters", type=int, default=None, help="Override train_iters")
    p.add_argument("--mesh", action="store_true", help="Shard rays over all devices")
    p.add_argument("--export-legacy", action="store_true", help="Write torch-layout ckpts too")
    return p


def main(argv=None) -> None:
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    args = build_parser().parse_args(argv)

    from ..train.config import load_config
    from ..train.trainer import Trainer

    cfg = load_config(args.config)
    trainer = Trainer(cfg, use_mesh=args.mesh, export_legacy=args.export_legacy)

    if args.eval:
        state = _load_state(trainer, args.load_checkpoint)
        v = trainer.validate(state)
        print(f"val_loss={v.get('val_loss'):.6f} val_psnr={v.get('val_psnr'):.3f} dB")
        _save_val_images(trainer, v)
        return

    if args.render_video:
        state = _load_state(trainer, args.load_checkpoint)
        _render_video(trainer, state, fast=args.fast,
                      fast_fg=args.fast_fg, fast_fine=args.fast_fine)
        return

    result = trainer.fit(max_iters=args.max_iters)
    if result.val_psnr is not None:
        print(f"final val_psnr={result.val_psnr:.3f} dB")
    if result.rays_per_sec is not None:
        print(f"throughput={result.rays_per_sec:.0f} rays/s")
    trainer.close()


def _load_state(trainer, load_checkpoint):
    import jax

    state = trainer.engine.init_state()
    if load_checkpoint and os.path.isfile(load_checkpoint):
        from ..io.torch_compat import import_legacy_checkpoint

        legacy = import_legacy_checkpoint(load_checkpoint)
        params = dict(state.params)
        params["coarse"] = legacy["params_coarse"]
        if legacy["params_fine"] is not None and "fine" in params:
            params["fine"] = legacy["params_fine"]
        state = state._replace(params=params, step=jax.numpy.int32(legacy["step"]))
        return state
    restored, step = trainer.ckpt.restore(
        state, int(load_checkpoint) if load_checkpoint else None
    )
    return restored if restored is not None else state


def _save_val_images(trainer, v):
    """GT-vs-render pair export (the reference's results/…/imgs/{reals,rendered}
    comparison layout)."""
    if "val_image" not in v:
        return
    import numpy as np
    from PIL import Image

    for sub in ("rendered", "reals"):
        os.makedirs(os.path.join(trainer.rundir, "imgs", sub), exist_ok=True)
    img = np.clip(v["val_image"] * 255, 0, 255).astype(np.uint8)
    Image.fromarray(img).save(
        os.path.join(trainer.rundir, "imgs", "rendered", "val_0.png")
    )
    ds = trainer.dataset
    if len(ds.val_idx):
        gt = np.clip(ds.images[int(ds.val_idx[0])] * 255, 0, 255).astype(np.uint8)
        Image.fromarray(gt).save(
            os.path.join(trainer.rundir, "imgs", "reals", "val_0.png")
        )
    print(f"wrote GT-vs-render pair under {trainer.rundir}/imgs/")


def _render_video(trainer, state, fast: bool = False,
                  fast_fg: float = 0.35, fast_fine: int = 64):
    import time

    import numpy as np
    from PIL import Image

    poses = trainer.dataset.render_poses
    if poses is None:
        raise SystemExit("dataset has no render path (no *_test_video.json / spiral)")
    outdir = os.path.join(trainer.rundir, "video")
    os.makedirs(outdir, exist_ok=True)
    import jax
    import jax.numpy as jnp

    render = trainer._render
    render_settings = None
    if fast:
        # Serving recipe (measured iso-PSNR on machina400 — see
        # logs/sweeps/fast_render_fg_r3.log): compaction savings re-spent
        # on fine depth.
        from ..rendering.fast_render import FastRenderSettings

        ds = trainer.dataset
        val = trainer.cfg.nerf.validation
        if not hasattr(trainer.engine, "make_fast_render_fn"):
            raise SystemExit("--fast needs the NGP engine (engine: ngp)")
        render_settings = FastRenderSettings(
            num_coarse=val.num_coarse,
            num_fine=fast_fine,
            fg_fraction=fast_fg,
            white_background=val.white_background,
        )
        render = trainer.engine.make_fast_render_fn(
            ds.intrinsics, ds.near, ds.far, ds.use_ndc,
            settings=render_settings,
        )

    # Pipelined dispatch (all frames in flight, one sync) — the serving
    # pattern; per-frame host syncs would serialize the device through the
    # dispatch channel. Poses are staged to the device in ONE transfer
    # first (a per-frame 4x4 upload costs a tunnel round trip per dispatch:
    # measured 8 fps instead of 24+ on the remote chip), and the warmup
    # frame is synced by a HOST READ: on the axon backend
    # block_until_ready returns before compilation fully lands, which
    # would charge residual compile to the first timed frames.
    n = len(poses)
    if fast and trainer.mesh is not None:
        # Multi-device serving: frames sharded over the mesh (pad the pose
        # batch to a device-count multiple; padded frames are discarded).
        nd = len(trainer.mesh.devices.reshape(-1))
        pad = (-n) % nd
        pose_arr = np.concatenate(
            [np.asarray(poses)] + [np.asarray(poses)[-1:]] * pad
        )
        batch = trainer.engine.make_fast_render_batch(
            ds.intrinsics, ds.near, ds.far, ds.use_ndc,
            settings=render_settings,
        )
        dposes_b = jnp.asarray(pose_arr)
        float(np.asarray(
            batch(eval_params(state), dposes_b, state.aux)["rgb"]
        ).sum())  # warmup incl. compile (host-read sync)
        t0 = time.perf_counter()
        out_b = batch(eval_params(state), dposes_b, state.aux)["rgb"]
        float(np.asarray(out_b).sum())
        dt = time.perf_counter() - t0
        dt = dt * n / (n + pad)  # dt covered n+pad rendered frames
        outs = list(out_b[:n])
    else:
        dposes = [jnp.asarray(np.asarray(p)) for p in poses]
        jax.block_until_ready(dposes)
        float(np.asarray(
            render(eval_params(state), dposes[0], state.aux)["rgb"]
        ).sum())
        t0 = time.perf_counter()
        outs = [render(eval_params(state), p, state.aux)["rgb"] for p in dposes]
        jax.block_until_ready(outs)
        float(np.asarray(outs[-1]).sum())  # full host sync (remote-chip safe)
        dt = time.perf_counter() - t0

    frames = []
    for i, o in enumerate(outs):
        f = np.asarray(o)
        frames.append(f)  # write_video scales unit-range floats itself
        img = np.clip(f * 255, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(outdir, f"frame_{i:04d}.png"))
    try:
        from ..io.image import write_video

        write_video(os.path.join(outdir, "video.mp4"), frames, fps=24)
    except Exception as e:  # video encoder optional; PNGs are the artifact
        print(f"mp4 encode skipped: {e}")
    print(
        f"wrote {n} frames to {outdir} "
        f"({n / dt:.1f} fps render{' [fast]' if fast else ''})"
    )


if __name__ == "__main__":
    main()
