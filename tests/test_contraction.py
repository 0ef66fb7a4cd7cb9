"""Scene-contraction + incremental-occupancy tests: the large-AABB
(aabb_scale > 2, fox-regime) path — the TPU equivalent of instant-ngp's
occupancy cascades (src/testbed_nerf.cu supports aabb_scale up to 128)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_kinematics_tpu.ops.contraction import (
    contract, contract_to_unit, uncontract, unit_to_world,
)
from nerf_kinematics_tpu.ops.occupancy import (
    init_grid, update_grid_incremental,
)


def test_contract_linear_inside_inner():
    pts = jnp.array([[0.0, 0.0, 0.0], [0.5, -0.3, 0.9], [-1.0, 1.0, 1.0]])
    np.testing.assert_allclose(np.asarray(contract(pts)), np.asarray(pts),
                               atol=1e-6)
    # With inner=4, |p|∞ <= 4 is linear (scaled by 1/4).
    p = jnp.array([[2.0, -3.0, 1.0]])
    np.testing.assert_allclose(np.asarray(contract(p, inner=4.0)),
                               np.asarray(p) / 4.0, atol=1e-6)


def test_contract_bounded_and_monotone():
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (512, 3)) * 50.0
    u = np.asarray(contract(pts))
    assert (np.abs(u) < 2.0).all()
    # Farther points land farther out in contracted space (per-direction).
    d = jnp.array([[1.0, 0.3, -0.2]])
    r = jnp.array([1.0, 2.0, 5.0, 20.0, 200.0])[:, None]
    m = np.max(np.abs(np.asarray(contract(d * r))), axis=-1)
    assert (np.diff(m) > 0).all() and m[-1] < 2.0


def test_uncontract_roundtrip():
    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (256, 3)) * jnp.array([0.5, 5.0, 50.0])
    rec = np.asarray(uncontract(contract(pts), 1.0))
    np.testing.assert_allclose(rec, np.asarray(pts), rtol=1e-4, atol=1e-5)
    # And the [0,1]³ grid-coordinate variant used by the occupancy grid.
    u01 = jax.random.uniform(key, (256, 3)) * 0.96 + 0.02
    rec01 = np.asarray(contract_to_unit(unit_to_world(u01, 2.0), 2.0))
    np.testing.assert_allclose(rec01, np.asarray(u01), rtol=1e-4, atol=1e-5)


def test_incremental_update_decays_everywhere():
    grid = init_grid(8, 1.0)._replace(density=jnp.full((8, 8, 8), 4.0))
    updated = update_grid_incremental(
        grid, lambda pts: jnp.zeros(pts.shape[0]), jax.random.PRNGKey(0),
        n_cells=256, decay=0.9,
    )
    np.testing.assert_allclose(np.asarray(updated.density), 4.0 * 0.9,
                               atol=1e-6)


def test_incremental_update_refreshes_sampled_cells():
    grid = init_grid(8, 1.0)._replace(density=jnp.zeros((8, 8, 8)))
    updated = update_grid_incremental(
        grid, lambda pts: jnp.full(pts.shape[0], 7.0), jax.random.PRNGKey(0),
        n_cells=8 * 512, decay=0.9,  # heavy oversampling: ~all cells hit
    )
    d = np.asarray(updated.density)
    assert (d == 7.0).mean() > 0.95
    assert d.max() == 7.0


def test_engine_contraction_resolves_by_bound():
    from nerf_kinematics_tpu.models.ngp import NGPConfig
    from nerf_kinematics_tpu.ops.hashgrid import HashGridConfig
    from nerf_kinematics_tpu.train.config import Config
    from nerf_kinematics_tpu.train.ngp_engine import NGPEngine

    small = NGPConfig(grid=HashGridConfig(n_levels=2, log2_table_size=10))
    assert not NGPEngine(Config(engine="ngp", ngp=small), scene_bound=1.0).contracted
    eng = NGPEngine(Config(engine="ngp", ngp=small), scene_bound=16.0)
    assert eng.contracted
    # Unit mapping stays in [0, 1] even for far points.
    far_pts = jnp.array([[40.0, -12.0, 3.0], [0.1, 0.0, -0.05]])
    u = np.asarray(eng._to_unit(far_pts))
    assert (u >= 0.0).all() and (u <= 1.0).all()
    # Forced off wins over the bound heuristic.
    off = dataclasses.replace(small, contraction="off")
    assert not NGPEngine(Config(engine="ngp", ngp=off), scene_bound=16.0).contracted


def test_fox_regime_halo_scene_trains_without_collapse():
    """VERDICT round-1 item 6: a fox-class (large-AABB) synthetic scene must
    train without quality collapse. Uses the fox_ngp.yml structure (ngp
    engine + occupancy + incremental maintenance) at test scale; the halo
    dataset sets aabb_scale=32 so contraction auto-enables (bound 16)."""
    from nerf_kinematics_tpu.data import make_synthetic_scene
    from nerf_kinematics_tpu.models.ngp import NGPConfig
    from nerf_kinematics_tpu.ops.hashgrid import HashGridConfig
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import (
        Config, NeRFConfig, OptimizerConfig,
    )
    from nerf_kinematics_tpu.train.ngp_engine import NGPEngine

    ds = make_synthetic_scene(n_views=9, resolution=32, variant="halo")
    assert ds.aabb_scale == 32.0
    bound = ds.aabb_scale / 2.0
    cfg = Config(
        engine="ngp",
        ngp=NGPConfig(
            grid=HashGridConfig(n_levels=4, n_features=2, log2_table_size=12,
                                base_resolution=4, max_resolution=64),
            density_width=32, density_layers=2,
            color_width=32, color_layers=2,
            use_occupancy=True, occ_resolution=32, occ_update_every=50,
            occ_full_every=100, occ_incremental_cells=4096,
        ),
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=32, num_fine=32, perturb=True),
            validation=RenderSettings(num_coarse=32, num_fine=32,
                                      perturb=False),
            num_random_rays=512,
        ),
        optimizer=OptimizerConfig(lr=5e-3),
    )
    engine = NGPEngine(cfg, scene_bound=bound)
    assert engine.contracted
    state = engine.init_state(0)
    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far, False,
                                  donate=False)
    images, poses = jnp.asarray(ds.images), jnp.asarray(ds.poses)
    losses = []
    for i in range(1, 201):
        state, m = step(state, images, poses)
        losses.append(float(m["loss"]))
        if i % 50 == 0:
            state = engine.update_occupancy(state, full=(i == 50 or i == 100))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.35 * losses[0], (losses[0], losses[-1])
