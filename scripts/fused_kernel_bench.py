#!/usr/bin/env python3
"""Microbench of the fused NGP kernel at the flagship shape.

Times fwd and fwd+bwd of ngp_fused_apply_cf on a flagship-sized point batch
(8192 rays x 96 samples = 786432 points) with the two-scan-length
subtraction from bench.py, plus reference numbers for XLA argsort at the
same N (to cost a sort-based windowed-encoder design).

    python scripts/fused_kernel_bench.py [--rays 8192] [--samples 96]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def timed(fn, args, n_small=5, n_big=25, reps=2):
    """Steady-state seconds/call via scan-length subtraction."""
    import jax
    import jax.numpy as jnp

    def make(n):
        def body(c, _):
            out = fn(*[a + c * 0.0 if isinstance(a, jnp.ndarray) else a
                       for a in args])
            s = jax.tree_util.tree_reduce(
                lambda acc, x: acc + x.astype("float32").sum(), out, 0.0)
            return s * 1e-30, None

        def run(c0):
            c, _ = jax.lax.scan(body, c0, None, length=n)
            return c
        return jax.jit(run)

    fs, fb = make(n_small), make(n_big)
    float(fs(0.0)); float(fb(0.0))  # compile
    ts = tb = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); float(fs(0.0))
        ts = min(ts, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fb(0.0))
        tb = min(tb, time.perf_counter() - t0)
    return (tb - ts) / (n_big - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--samples", type=int, default=96)
    args = ap.parse_args()

    from nerf_kinematics_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from nerf_kinematics_tpu.train.config import load_config

    cfg = load_config("configs/machina_ngp.yml")
    n = args.rays * args.samples
    key = jax.random.PRNGKey(0)
    xt = jax.random.uniform(key, (3, n))
    vd = jax.random.normal(key, (3, n))
    vd = vd / jnp.linalg.norm(vd, axis=0, keepdims=True)

    from nerf_kinematics_tpu.train.ngp_engine import NGPEngine
    engine = NGPEngine(cfg)
    params = engine.init_state(0).params["coarse"]
    raw = engine._fused_params(params)
    ccfg = cfg.ngp.cp

    from nerf_kinematics_tpu.ops.ngp_fused_pallas import ngp_fused_apply_cf

    def fwd(r, x, v):
        return ngp_fused_apply_cf(r, x, v, ccfg, 4096, False)

    def fwdbwd(r, x, v):
        def loss(rr):
            return ngp_fused_apply_cf(rr, x, v, ccfg, 4096, False).sum()
        return jax.grad(loss)(r)

    t_f = timed(fwd, (raw, xt, vd))
    t_fb = timed(fwdbwd, (raw, xt, vd))
    print(f"points {n}: fused fwd {t_f*1e3:.3f} ms "
          f"({n/t_f/1e6:.1f} Mpts/s)")
    print(f"points {n}: fused fwd+bwd {t_fb*1e3:.3f} ms "
          f"({n/t_fb/1e6:.1f} Mpts/s)")

    # argsort cost reference (windowed-encoder design input)
    cid = (xt[0] * 16).astype(jnp.int32) * 256 + \
          (xt[1] * 16).astype(jnp.int32) * 16 + (xt[2] * 16).astype(jnp.int32)

    def sortfn(c):
        return jnp.argsort(c)

    t_s = timed(sortfn, (cid,))
    print(f"argsort {n} int32 keys: {t_s*1e3:.3f} ms")

    def sort_gather_scatter(c, x):
        perm = jnp.argsort(c)
        xs = x[:, perm]
        inv = jnp.argsort(perm)
        return xs[:, inv]

    t_gs = timed(sort_gather_scatter, (cid, xt))
    print(f"argsort + gather + inverse-scatter (3,N): {t_gs*1e3:.3f} ms")


if __name__ == "__main__":
    main()
