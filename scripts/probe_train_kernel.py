#!/usr/bin/env python3
"""Direct timing probe of the fused train kernel (ngp_fused_train_cf) at
the flagship shape, sweeping RAYS_PER_BLOCK — isolates the kernel from the
rest of the step. Usage: python scripts/probe_train_kernel.py [--rb 64 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rb", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--samples", type=int, default=48)
    ap.add_argument("--vmem-mb", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_kinematics_tpu.models.ngp import NGPConfig
    from nerf_kinematics_tpu.ops import ngp_fused_pallas as fp
    from nerf_kinematics_tpu.train.config import Config, load_config
    from nerf_kinematics_tpu.train.ngp_engine import NGPEngine
    from nerf_kinematics_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_config(os.path.join(root, "configs", "machina_ngp.yml"))
    engine = NGPEngine(cfg, scene_bound=1.0)
    params = engine.init_state(0).params["coarse"]
    fused = engine._fused_params(params)

    R, S = args.rays, args.samples
    key = jax.random.PRNGKey(0)
    if args.vmem_mb:
        fp.VMEM_LIMIT = args.vmem_mb * 1024 * 1024

    for rb in args.rb:
        fp.RAYS_PER_BLOCK = rb
        n = R * S
        k1, k2, k3, k4 = jax.random.split(key, 4)
        xt = jax.random.uniform(k1, (3, n))
        vdt = jax.random.normal(k2, (3, n))
        vdt = vdt / jnp.linalg.norm(vdt, axis=0, keepdims=True)
        dists = jax.random.uniform(k3, (1, n), minval=0.01, maxval=0.1)
        tgt = jax.random.uniform(k4, (3, R))

        def call(eps):
            err, maps, d = fp.ngp_fused_train_cf(
                fused, xt + eps * 0.0, vdt, dists, tgt,
                engine.ngp_config.cp, S, True, 1.0 / (3.0 * R),
            )
            return err

        def body(c, e):
            return c + call(e).sum() * 1e-30, None

        @jax.jit
        def run():
            tot, _ = jax.lax.scan(body, 0.0, jnp.zeros((50,)))
            return tot

        try:
            float(run())
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run())
                best = min(best, time.perf_counter() - t0)
            print(f"RB={rb:4d}: {best / 50 * 1e3:.3f} ms/call")
        except Exception as e:  # noqa: BLE001
            print(f"RB={rb:4d}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
