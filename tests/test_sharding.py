"""Multi-device sharding tests on the 8-device virtual CPU mesh: ray-batch
data parallelism with replicated params (SURVEY.md §7 step 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kinematics_tpu.data import make_synthetic_scene
from nerf_kinematics_tpu.models.flexible_nerf import FlexibleNeRFConfig
from nerf_kinematics_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
from nerf_kinematics_tpu.rendering.renderer import RenderSettings
from nerf_kinematics_tpu.train.config import Config, NeRFConfig
from nerf_kinematics_tpu.train.loop import ClassicNerf


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh()


def _tiny_cfg():
    return Config(
        model_coarse=FlexibleNeRFConfig(hidden_size=32, num_encoding_fn_xyz=4,
                                        num_encoding_fn_dir=2),
        model_fine=None,
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=16, num_fine=0),
            validation=RenderSettings(num_coarse=16, num_fine=0, perturb=False),
            num_random_rays=256,
        ),
    )


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


def test_sharded_training_step_runs_and_converges(mesh):
    ds = make_synthetic_scene(n_views=6, resolution=24)
    engine = ClassicNerf(_tiny_cfg(), mesh=mesh)
    state = engine.init_state(0)
    state = jax.device_put(state, replicated_sharding(mesh))
    images = jax.device_put(jnp.asarray(ds.images), replicated_sharding(mesh))
    poses = jax.device_put(jnp.asarray(ds.poses), replicated_sharding(mesh))

    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far, False, donate=False)
    losses = []
    for _ in range(40):
        state, m = step(state, images, poses)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_matches_single_device(mesh):
    """One sharded step must produce numerically identical params to the
    unsharded step (same PRNG stream ⇒ same batch ⇒ same grads)."""
    ds = make_synthetic_scene(n_views=4, resolution=16)
    cfg = _tiny_cfg()

    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)

    eng_single = ClassicNerf(cfg, mesh=None)
    s0 = eng_single.init_state(0)
    step_single = eng_single.make_train_step(ds.intrinsics, ds.near, ds.far, False, donate=False)
    s1, m1 = step_single(s0, images, poses)

    eng_mesh = ClassicNerf(cfg, mesh=mesh)
    t0 = jax.device_put(eng_mesh.init_state(0), replicated_sharding(mesh))
    step_mesh = eng_mesh.make_train_step(ds.intrinsics, ds.near, ds.far, False, donate=False)
    t1, m2 = step_mesh(
        t0,
        jax.device_put(images, replicated_sharding(mesh)),
        jax.device_put(poses, replicated_sharding(mesh)),
    )

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(t1.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_batch_sharding_distributes_rows(mesh):
    x = jnp.arange(64.0).reshape(8, 8)
    xs = jax.device_put(x, batch_sharding(mesh))
    # Each device holds one row shard.
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (1, 8)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))


def test_multihost_helpers_single_process(mesh):
    """Single-process semantics of the multi-host utilities."""
    from nerf_kinematics_tpu.parallel.multihost import (
        host_local_slice,
        initialize_multihost,
        make_global_batch,
    )

    assert initialize_multihost() is False  # no coordinator → no-op
    sl = host_local_slice(10)
    assert (sl.start, sl.stop) == (0, 10)  # one process owns everything

    local = np.arange(16.0).reshape(8, 2)
    arr = make_global_batch(local, mesh)
    assert len(arr.addressable_shards) == 8
    np.testing.assert_allclose(np.asarray(arr), local)


# ---------------------------------------------------------------------------
# Flagship-fidelity multichip coverage: the NGP engine with the hull
# occupancy proposal, trained through Trainer.fit's lax.scan chunks WITH
# occupancy maintenance (one full sweep + incremental decay/requery), on the
# 8-device mesh — the round-2 gap (VERDICT round 2, "dryrun fidelity is
# minimal"): update_occupancy never executed under a mesh before.
# ---------------------------------------------------------------------------

def _tiny_ngp_cfg(tmpdir: str):
    import dataclasses

    from nerf_kinematics_tpu.models.ngp import NGPConfig
    from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig
    from nerf_kinematics_tpu.train.config import ExperimentConfig

    return Config(
        engine="ngp",
        ngp=NGPConfig(
            encoder="cp",
            fused="off",
            cp=CPGridConfig(n_levels=2, n_components=8, base_resolution=4,
                            max_resolution=16, table_size=32, use_bf16=False),
            use_occupancy=True,
            occ_resolution=16,
            occ_update_every=8,
            occ_full_every=100,   # full sweep on 1st refresh, incremental after
            occ_incremental_cells=512,
            occ_proposal="hull",
        ),
        nerf=NeRFConfig(
            # shuffled = the flagship recipe's sampler; Trainer builds and
            # threads the ray buffer, so the fit-parity test covers it.
            train=RenderSettings(num_coarse=8, num_fine=8,
                                 merge_hierarchical=False,
                                 pixel_sampler="shuffled"),
            validation=RenderSettings(num_coarse=8, num_fine=8, perturb=False,
                                      merge_hierarchical=False),
            num_random_rays=128,
        ),
        experiment=ExperimentConfig(id="mesh-ngp", logdir=tmpdir,
                                    print_every=8, validate_every=24,
                                    save_every=0, train_iters=24),
    )


def test_ngp_hull_fit_parity_mesh_vs_single(mesh, tmp_path):
    """Trainer.fit (scan chunks + full & incremental occupancy refreshes) on
    the NGP+hull config: the 8-device mesh run must match the single-device
    run — same PRNG stream, grads psum'd over ICI by sharding annotations."""
    from nerf_kinematics_tpu.train.trainer import Trainer

    ds = make_synthetic_scene(n_views=4, resolution=16)

    t_single = Trainer(_tiny_ngp_cfg(str(tmp_path / "s")), dataset=ds,
                       use_mesh=False)
    r_single = t_single.fit()
    t_single.close()

    t_mesh = Trainer(_tiny_ngp_cfg(str(tmp_path / "m")), dataset=ds,
                     use_mesh=True)
    assert t_mesh.mesh is not None, "mesh trainer must actually use the mesh"
    r_mesh = t_mesh.fit()
    t_mesh.close()

    # Both exercised occupancy maintenance: aux grids updated from the
    # all-ones init and identical across the two runs.
    g1 = np.asarray(r_single.state.aux.density)
    g2 = np.asarray(r_mesh.state.aux.density)
    assert not np.allclose(g1, 1.0), "occupancy grid never updated"
    np.testing.assert_allclose(g1, g2, atol=1e-4)

    np.testing.assert_allclose(
        float(r_single.last_metrics["loss"]),
        float(r_mesh.last_metrics["loss"]), rtol=1e-3, atol=1e-6,
    )
    for a, b in zip(jax.tree_util.tree_leaves(r_single.state.params),
                    jax.tree_util.tree_leaves(r_mesh.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    assert r_mesh.val_psnr is not None and np.isfinite(r_mesh.val_psnr)
