#!/usr/bin/env python3
"""Quantify the hat-weight (two-hot) build's share of fused-kernel time.

The encoder contraction is MXU-cheap (~45k MACs/point at C=64) but the
(Tl, B) tent-weight operands are built with ~6 VPU ops per element — the
hypothesis is the kernel is VPU-bound on this build. Timed variants:

  real     — production _hat_weights (circular tent / plain tent)
  nomin    — skip the circular wrap min (WRONG numerics, same op count -2)
  iotaonly — W = iota (WRONG, near-zero build cost: quantifies everything
             else: matmuls + MLPs + products)

The (real - iotaonly) gap is the W-build cost; (real - nomin) is the wrap
min's share. Run on the TPU with the flagship shape.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def timed(cfg, block=4096, n=393216, reps=30):
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
        o = ngp_fused_apply_cf(p, xt, vdt, cfg, block)
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


def main():
    import jax.numpy as jnp

    from nerf_kinematics_tpu.ops import ngp_fused_pallas as fp
    from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig

    cfg = CPGridConfig(n_levels=5, n_components=64, base_resolution=32,
                       max_resolution=1024, table_size=192, use_bf16=True)

    real = fp._hat_weights

    def nomin(p, iota_f32, R, F, wdtype, fold="periodic", salt=0):
        p = jnp.clip(p, 0.0, R - 1e-4)
        if F:
            p = jnp.mod(p, float(F))
        d = jnp.abs(p - iota_f32)
        return jnp.maximum(1.0 - d, 0.0).astype(wdtype)

    def iotaonly(p, iota_f32, R, F, wdtype, fold="periodic", salt=0):
        return (iota_f32 * 1e-3).astype(wdtype)

    for name, fn in [("real", real), ("nomin", nomin), ("iotaonly", iotaonly)]:
        fp._hat_weights = fn
        tf, tg = timed(cfg)
        print(f"{name:9s} fwd {tf*1e3:6.2f} ms  fwd+bwd {tg*1e3:6.2f} ms",
              flush=True)
    fp._hat_weights = real


if __name__ == "__main__":
    main()
