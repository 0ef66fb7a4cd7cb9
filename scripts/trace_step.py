#!/usr/bin/env python3
"""Capture a TPU profiler trace of N train steps and print per-op time,
grouped by HLO/kernel name — localizes step time the scan-timer can't.

Usage: python scripts/trace_step.py [--rays 8192] [--steps 10] [--fused on]
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import gzip
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def hlo_stats(logdir):
    """Run xprof's hlo_stats tool over the captured xplanes; return the
    parsed JSON rows (per-HLO total/avg time)."""
    import json

    from xprof.convert import raw_to_tool_data

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    return json.loads(data)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--fused", default=None, choices=["auto", "on", "off"])
    ap.add_argument("--logdir", default="/tmp/trace_step")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import shutil

    shutil.rmtree(args.logdir, ignore_errors=True)

    import jax
    import jax.numpy as jnp

    from nerf_kinematics_tpu.data import make_synthetic_scene
    from nerf_kinematics_tpu.train.config import load_config
    from nerf_kinematics_tpu.train.trainer import Trainer

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_config(os.path.join(root, "configs", "machina_ngp.yml"))
    cfg = cfg.replace(
        nerf=dataclasses.replace(cfg.nerf, num_random_rays=args.rays),
        experiment=dataclasses.replace(cfg.experiment, logdir="/tmp/prof_logs"),
    )
    if args.fused:
        cfg = cfg.replace(ngp=dataclasses.replace(cfg.ngp, fused=args.fused))

    ds = make_synthetic_scene(n_views=12, resolution=100)
    trainer = Trainer(cfg, dataset=ds)
    engine = trainer.engine
    state = engine.init_state(0)
    images, poses = trainer.images, trainer.poses
    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far, False,
                                  donate=False)
    ray_buf = None
    if cfg.nerf.train.pixel_sampler == "shuffled":
        from nerf_kinematics_tpu.train.loop import build_shuffled_ray_buffer

        ray_buf = build_shuffled_ray_buffer(
            images, poses, ds.intrinsics, seed=0
        )
    # warm
    for _ in range(3):
        state, m = step(state, images, poses, ray_buf)
        float(m["loss"])

    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            state, m = step(state, images, poses, ray_buf)
        float(m["loss"])

    stats = hlo_stats(args.logdir)
    # Google-charts DataTable: {cols: [{label,...}], rows: [{c:[{v},...]}]}
    labels = [c.get("label") or c.get("id") for c in stats["cols"]]
    recs = [dict(zip(labels, [cell.get("v") for cell in row["c"]]))
            for row in stats["rows"]]
    tkey = next(k for k in labels if k and "total" in k.lower()
                and "time" in k.lower() and "self" not in k.lower())
    nkey = next(k for k in labels if k and ("expression" in k.lower()
                or k.lower() == "hlo op name"))
    ckey = next((k for k in labels if k and "categor" in k.lower()), None)
    recs.sort(key=lambda r: -float(r.get(tkey) or 0))
    grand = sum(float(r.get(tkey) or 0) for r in recs)
    print(f"columns: {labels}")
    print(f"grand total '{tkey}': {grand:.1f}, per step: "
          f"{grand/args.steps:.1f}")
    for r in recs[: args.top]:
        t = float(r.get(tkey) or 0)
        fw = str(r.get("Framework op name", ""))[-70:]
        bound = str(r.get("Bound by", ""))
        print(f"{t/args.steps:10.1f} {t/grand*100:5.1f}% "
              f"{str(r.get(ckey,''))[:16]:16s} "
              f"{str(r.get(nkey,''))[:28]:28s} {bound:10s} {fw}")


if __name__ == "__main__":
    main()
