#!/usr/bin/env python3
"""Fox pose refinement experiment (VERDICT r3 #7).

The fox poses come from the from-scratch SfM solve (poses/sfm.py, 0.90 px
mean reprojection); the rendered val frame shows registration-class blur.
This script measures how much of the remaining val gap is pose error:

  stage 0: baseline val PSNR from the trained checkpoint (shipped eval
           budget);
  stage 1: photometric alignment of the VAL pose only (poses/refine.py —
           never touches training data) → re-eval;
  stage 2: joint photometric refinement of all TRAIN poses against the
           frozen field, then a model fine-tune on the refined poses,
           then re-align the val pose → re-eval.

    python scripts/fox_pose_refine.py [--ckpt logs/fox-ngp/checkpoints]
        [--stage2] [--finetune-steps 5000]

Appends results to logs/fox-ngp/pose_refine_r4.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/fox_ngp.yml")
    ap.add_argument("--ckpt", default="logs/fox-ngp/checkpoints")
    ap.add_argument("--stage2", action="store_true")
    ap.add_argument("--finetune-steps", type=int, default=5000)
    ap.add_argument("--iters", type=int, default=120)
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="logs/fox-ngp/pose_refine_r4.json")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    help="dotted.path=value config override (YAML-parsed), "
                    "repeatable — match the overrides the checkpoint was "
                    "trained with (e.g. ngp.n_components=96)")
    args = ap.parse_args()

    from nerf_kinematics_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from nerf_kinematics_tpu.io.checkpoint import CheckpointManager
    from nerf_kinematics_tpu.metrics.psnr import psnr
    from nerf_kinematics_tpu.poses.refine import refine_pose, refine_poses
    from nerf_kinematics_tpu.train.config import load_config
    from nerf_kinematics_tpu.train.loop import eval_params
    from nerf_kinematics_tpu.train.trainer import Trainer

    if args.overrides:
        import yaml

        from nerf_kinematics_tpu.train.config import config_from_dict
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from exp_train import apply_override

        with open(args.config) as f:
            raw = yaml.safe_load(f)
        for o in args.overrides:
            apply_override(raw, o)
        cfg = config_from_dict(raw)
    else:
        cfg = load_config(args.config)
    # Keep the canonical logs/fox-ngp run dir (committed evidence) pristine:
    # the stage-2 finetune writes its metrics/checkpoints to its own id.
    import dataclasses

    cfg = dataclasses.replace(
        cfg, experiment=dataclasses.replace(
            cfg.experiment, id=cfg.experiment.id + "-refine"))
    trainer = Trainer(cfg)
    engine, ds = trainer.engine, trainer.dataset
    state = engine.init_state(0)
    state, step = CheckpointManager(os.path.abspath(args.ckpt)).restore(state)
    if state is None:
        raise SystemExit(f"no checkpoint under {args.ckpt}")
    state = engine.update_occupancy(state, full=True)
    p = eval_params(state)

    vi = int(ds.val_idx[0])
    gt = np.asarray(ds.images[vi])
    pose0 = jnp.asarray(ds.poses[vi])
    render = trainer._render  # shipped eval budget
    wb = bool(cfg.nerf.validation.white_background)

    res = {"ckpt_step": int(step), "iters": args.iters, "rays": args.rays,
           "samples": args.samples, "lr": args.lr}

    def val_psnr(c2w, params=None, aux=None):
        img = np.asarray(render(params if params is not None else p,
                                c2w, aux if aux is not None else state.aux
                                )["rgb"])
        return float(psnr(img, gt))

    res["baseline"] = round(val_psnr(pose0), 3)
    print("baseline val:", res["baseline"], flush=True)

    t0 = time.perf_counter()
    refined, delta, losses = refine_pose(
        engine, state.params, state.aux, gt, pose0, ds.intrinsics,
        ds.near, ds.far, n_iters=args.iters, n_rays=args.rays,
        n_samples=args.samples, lr=args.lr, white_background=wb,
    )
    res["stage1_secs"] = round(time.perf_counter() - t0, 1)
    res["stage1_delta"] = [round(float(x), 6) for x in np.asarray(delta)]
    res["stage1_loss_first_last"] = [round(losses[0], 6), round(losses[-1], 6)]
    res["stage1_val"] = round(val_psnr(refined), 3)
    print("stage1 (val-pose aligned):", res["stage1_val"],
          "delta:", res["stage1_delta"], flush=True)

    if args.stage2:
        imgs_tr, poses_tr = ds.split("train")
        t0 = time.perf_counter()
        refined_tr, deltas_tr = refine_poses(
            engine, state.params, state.aux, imgs_tr, poses_tr,
            ds.intrinsics, ds.near, ds.far, n_iters=args.iters * 8,
            n_rays=4096, n_samples=args.samples, lr=args.lr,
            white_background=wb,
        )
        res["stage2_refine_secs"] = round(time.perf_counter() - t0, 1)
        res["stage2_delta_rms"] = float(
            np.sqrt(np.mean(np.asarray(deltas_tr) ** 2)))
        # Fine-tune the model on the refined train poses.
        trainer.poses = jnp.asarray(refined_tr)
        t0 = time.perf_counter()
        total = int(state.step) + args.finetune_steps
        result = trainer.fit(max_iters=total, state=state)
        state2 = result.state
        res["stage2_finetune_secs"] = round(time.perf_counter() - t0, 1)
        p2 = eval_params(state2)
        res["stage2_val_at_pose0"] = round(
            val_psnr(pose0, p2, state2.aux), 3)
        refined2, delta2, losses2 = refine_pose(
            engine, state2.params, state2.aux, gt, pose0, ds.intrinsics,
            ds.near, ds.far, n_iters=args.iters, n_rays=args.rays,
            n_samples=args.samples, lr=args.lr, white_background=wb,
        )
        res["stage2_val"] = round(val_psnr(refined2, p2, state2.aux), 3)
        res["stage2_delta"] = [round(float(x), 6) for x in np.asarray(delta2)]
        print("stage2 (train refined + finetune):", res["stage2_val"],
              flush=True)

    print(json.dumps(res))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    existing = []
    if os.path.exists(args.out):
        try:
            existing = json.load(open(args.out))
        except Exception:
            existing = []
    existing.append(res)
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1)


if __name__ == "__main__":
    main()
