#!/usr/bin/env python3
"""Sweep CP-encoder shapes (L, C, T) for fused-kernel speed at matched
parameter budget, then (optionally) train machina briefly for quality.

MXU tiles are 128-wide: n_components C < 128 wastes the output dimension
of every encoder contraction, and table rows T < 128 waste the contraction
dimension. This sweep quantifies what reshaping the capacity into fewer,
wider levels buys.

Usage: python scripts/encoder_shapes.py [--train]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def kernel_speed(cfg, n=393216, reps=20):
    import jax
    import jax.numpy as jnp

    from nerf_kinematics_tpu.ops.ngp_fused_pallas import ngp_fused_apply_cf

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    LC = cfg.out_dim
    params = {
        "lines": jax.random.normal(
            ks[0], (cfg.n_levels, 3, cfg.table_size, cfg.n_components)
        ),
        "dW": [jax.random.normal(ks[1], (LC, 64)) * 0.05,
               jax.random.normal(ks[2], (64, 64)) * 0.1,
               jax.random.normal(ks[3], (64, 16)) * 0.1],
        "db": [jnp.zeros((64, 1)), jnp.zeros((64, 1)), jnp.zeros((16, 1))],
        "cW": [jax.random.normal(ks[4], (32, 64)) * 0.1,
               jax.random.normal(ks[5], (64, 64)) * 0.1,
               jax.random.normal(ks[6], (64, 64)) * 0.1,
               jax.random.normal(ks[7], (64, 3)) * 0.1],
        "cb": [jnp.zeros((64, 1)), jnp.zeros((64, 1)), jnp.zeros((64, 1)),
               jnp.zeros((3, 1))],
    }
    xt = jax.random.uniform(key, (3, n))
    vdt = jax.random.normal(key, (3, n))
    vdt = vdt / jnp.linalg.norm(vdt, axis=0, keepdims=True)

    def loss(p, xt, vdt):
        o = ngp_fused_apply_cf(p, xt, vdt, cfg)
        return (o.astype(jnp.float32) ** 2).mean()

    fwd = jax.jit(loss)
    g = jax.jit(jax.grad(loss))
    jax.block_until_ready(g(params, xt, vdt))
    float(fwd(params, xt, vdt))
    t0 = time.time()
    for _ in range(reps):
        out = fwd(params, xt, vdt)
    jax.block_until_ready(out)
    tf = (time.time() - t0) / reps
    t0 = time.time()
    for _ in range(reps):
        gg = g(params, xt, vdt)
    jax.block_until_ready(gg)
    tg = (time.time() - t0) / reps
    return tf, tg


def train_quality(shape, steps=2000):
    """Short machina training with this encoder shape; returns val PSNR."""
    import jax.numpy as jnp

    from nerf_kinematics_tpu.data import load_dataset
    from nerf_kinematics_tpu.metrics.psnr import psnr
    from nerf_kinematics_tpu.train.config import load_config
    from nerf_kinematics_tpu.train.trainer import Trainer

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_config(os.path.join(root, "configs", "machina_ngp.yml"))
    L, C, T, base = shape
    cfg = cfg.replace(
        ngp=dataclasses.replace(
            cfg.ngp,
            cp=dataclasses.replace(cfg.ngp.cp, n_levels=L, n_components=C,
                                   table_size=T, base_resolution=base),
        ),
        experiment=dataclasses.replace(cfg.experiment,
                                       logdir="/tmp/shape_logs",
                                       train_iters=steps,
                                       validate_every=steps,
                                       save_every=0, print_every=0),
    )
    trainer = Trainer(cfg)
    result = trainer.fit()
    trainer.close()
    return result.val_psnr


SHAPES = [
    # (L, C, T, base_res)  — params/line = T*C; total = L*3*T*C
    (5, 48, 192, 32),    # current flagship: 138k params
    (3, 128, 128, 32),   # full-tile contraction+output: 147k
    (4, 64, 160, 32),    # middle ground: 164k
    (3, 128, 192, 32),   # wider tables: 221k
    (5, 64, 128, 32),    # more levels, tile-width C: 123k
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="also run short machina training per shape")
    ap.add_argument("--steps", type=int, default=2000)
    args = ap.parse_args()

    from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig

    for L, C, T, base in SHAPES:
        cfg = CPGridConfig(n_levels=L, n_components=C, base_resolution=base,
                           max_resolution=1024, table_size=T, use_bf16=True)
        tf, tg = kernel_speed(cfg)
        n_params = L * 3 * T * C
        line = (f"L={L} C={C:3d} T={T:3d} params={n_params/1e3:6.0f}k  "
                f"fwd {tf*1e3:6.2f} ms  fwd+bwd {tg*1e3:6.2f} ms")
        if args.train:
            p = train_quality((L, C, T, base), steps=args.steps)
            line += f"  psnr@{args.steps} {p:.2f} dB"
        print(line, flush=True)


if __name__ == "__main__":
    main()
