#!/usr/bin/env python3
"""Reference-scale marching-cubes evidence (VERDICT r3 #6).

The reference logged a concrete extraction: 2,699,441 verts / 5,167,090
tris at 256³, threshold 2.5 (`instant_ngp_collab_cloud.ipynb` cell 28).
This script runs the same export on a trained checkpoint, logs
verts/tris/runtime for 256³ (stats JSON), and writes a small committable
PLY at a reduced grid (the full 256³ PLY is hundreds of MB — the stats are
the parity evidence; the small PLY is the openable artifact).

    python scripts/mesh_evidence.py configs/machina_ngp.yml \
        --ckpt logs/machina-ngp/checkpoints \
        --out logs/machina-ngp [--iso 2.5]
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
    ap.add_argument("config")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--iso", type=float, default=2.5)
    ap.add_argument("--small-res", type=int, default=96,
                    help="grid for the committed small PLY")
    args = ap.parse_args()

    from nerf_kinematics_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from nerf_kinematics_tpu.export.mesh import extract_mesh_from_engine
    from nerf_kinematics_tpu.io.checkpoint import CheckpointManager
    from nerf_kinematics_tpu.train.config import load_config
    from nerf_kinematics_tpu.train.loop import eval_params
    from nerf_kinematics_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    trainer = Trainer(cfg)
    engine = trainer.engine
    state = engine.init_state(0)
    state, step = CheckpointManager(os.path.abspath(args.ckpt)).restore(state)
    if state is None:
        raise SystemExit(f"no checkpoint under {args.ckpt}")
    p = eval_params(state)

    os.makedirs(args.out, exist_ok=True)
    stats = {"config": args.config, "ckpt_step": int(step), "iso": args.iso}

    t0 = time.perf_counter()
    verts, tris = extract_mesh_from_engine(engine, p, resolution=256,
                                           iso=args.iso)
    stats["res256"] = {
        "verts": int(len(verts)), "tris": int(len(tris)),
        "secs": round(time.perf_counter() - t0, 2),
        "reference_cell28": {"verts": 2699441, "tris": 5167090,
                             "scene": "fox (different scene; same export "
                                      "path/scale)",
                             "comparability": "columns are NOT directly "
                             "comparable: the reference runs marching CUBES "
                             "(≤5 tris/cell) on fox; this repo runs marching "
                             "TETRAHEDRA (6 tets/cell, ≤2 tris each → ~2× "
                             "the triangle count for the same surface) on "
                             "machina. Both emit globally WELDED indexed "
                             "meshes (V≈T/2); compare the V/T ratio, not "
                             "absolute counts"},
    }
    print("256^3:", stats["res256"])

    ply = os.path.join(args.out, f"mesh_{args.small_res}.ply")
    t0 = time.perf_counter()
    v2, t2 = extract_mesh_from_engine(engine, p, resolution=args.small_res,
                                      iso=args.iso, path=ply)
    stats[f"res{args.small_res}"] = {
        "verts": int(len(v2)), "tris": int(len(t2)),
        "secs": round(time.perf_counter() - t0, 2),
        "ply": ply, "ply_bytes": os.path.getsize(ply),
    }
    print(f"{args.small_res}^3:", stats[f"res{args.small_res}"])

    out = os.path.join(args.out, "mesh_stats.json")
    with open(out, "w") as f:
        json.dump(stats, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
