"""Worker for tests/test_multihost.py: one process of a 2-process
jax.distributed run (or the single-process baseline), CPU backend with 4
virtual devices per process.

Usage: python _multihost_worker.py <port> <process_id> <num_processes> \
    [save=<dir> | restore=<dir>]

num_processes == 1 skips jax.distributed (baseline: same math, one process,
8 local devices). Prints ``MULTIHOST_LOSS <float>`` on success.

Optional checkpoint round-trip (VERDICT r4 #7 — real multi-host failures
live in save/restore, not the step): ``save=<dir>`` writes an orbax
checkpoint after the two steps; ``restore=<dir>`` instead restores the
latest checkpoint into THIS topology's mesh (which may differ from the
topology that saved it), runs ONE more step, and prints the loss — the
parent test asserts cross-topology parity (2-proc save → 1-proc restore
and the reverse both match the pure single-process run).

Covers SURVEY.md §2.5's multi-host DCN input pipeline for real: every
process loads only its host-local slice of the image set, assembles the
global sharded array with jax.make_array_from_process_local_data, and runs
one NGP train step over the global 8-device mesh. Loss must match the
single-process baseline (asserted by the parent test).
"""

import os
import sys


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    ckpt_mode, ckpt_dir = None, None
    if len(sys.argv) > 4:
        ckpt_mode, _, ckpt_dir = sys.argv[4].partition("=")
    # JAX_PLATFORMS / XLA_FLAGS must be set by the SPAWNING process (the
    # interpreter may import jax from sitecustomize before this line runs).
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    import jax

    jax.config.update("jax_platforms", "cpu")

    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
            initialization_timeout=60,
        )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nerf_kinematics_tpu.data import make_synthetic_scene
    from nerf_kinematics_tpu.models.ngp import NGPConfig
    from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig
    from nerf_kinematics_tpu.parallel.multihost import (
        host_local_slice,
        initialize_multihost,
        make_global_batch,
    )
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import Config, NeRFConfig
    from nerf_kinematics_tpu.train.ngp_engine import NGPEngine

    devs = jax.devices()
    assert len(devs) == 8, f"want 8 global devices, got {len(devs)}"
    assert jax.process_count() == nproc
    # Already-initialized path of the helper.
    assert initialize_multihost() is (nproc > 1)

    mesh = Mesh(np.array(devs), ("data",))

    cfg = Config(
        engine="ngp",
        ngp=NGPConfig(
            encoder="cp", fused="off", use_occupancy=False,
            cp=CPGridConfig(n_levels=2, n_components=8, base_resolution=8,
                            max_resolution=32, table_size=16),
            density_width=16, density_layers=2,
            color_width=16, color_layers=2,
        ),
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=4, num_fine=4, perturb=True,
                                 merge_hierarchical=False),
            validation=RenderSettings(num_coarse=4, num_fine=4,
                                      perturb=False,
                                      merge_hierarchical=False),
            num_random_rays=64,
        ),
    )
    ds = make_synthetic_scene(n_views=8, resolution=16)
    images = np.asarray(ds.images, np.float32)
    poses = np.asarray(ds.poses, np.float32)

    # DCN input pipeline: this host materializes ONLY its slice of the
    # image set; the global array is assembled across processes.
    sl = host_local_slice(images.shape[0])
    g_images = make_global_batch(images[sl], mesh)
    assert g_images.shape == images.shape

    rep = NamedSharding(mesh, P())

    def replicate(x):
        return jax.make_array_from_process_local_data(rep, np.asarray(x))

    g_poses = replicate(poses)

    engine = NGPEngine(cfg, mesh=mesh, scene_bound=1.0)
    state = jax.tree_util.tree_map(replicate, engine.init_state(0))
    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far,
                                  ds.use_ndc, donate=False)

    if ckpt_mode == "restore":
        from nerf_kinematics_tpu.io.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        # The freshly-initialized replicated state carries THIS topology's
        # mesh shardings — restore places shards straight onto it, even
        # when the checkpoint was written by a different process count.
        state, restored_step = mgr.restore(state)
        assert state is not None, f"no checkpoint under {ckpt_dir}"
        mgr.close()
        state, metrics = step(state, g_images, g_poses)
        loss = float(np.asarray(jax.device_get(metrics["loss"])))
        print(f"MULTIHOST_RESTORED_STEP {restored_step}", flush=True)
        print(f"MULTIHOST_LOSS {loss:.10f}", flush=True)
        return

    for _ in range(2):
        state, metrics = step(state, g_images, g_poses)
    if ckpt_mode == "save":
        from nerf_kinematics_tpu.io.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        mgr.save(2, state)
        mgr.close()
    # loss is replicated (fully addressable on every process).
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    print(f"MULTIHOST_LOSS {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
