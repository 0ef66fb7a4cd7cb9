"""NGP engine + occupancy integration: training with the occupancy proposal
stays finite and converges; the grid refresh updates engine aux state."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_kinematics_tpu.data import make_synthetic_scene
from nerf_kinematics_tpu.models.ngp import NGPConfig
from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig
from nerf_kinematics_tpu.rendering.renderer import RenderSettings
from nerf_kinematics_tpu.train.config import Config, NeRFConfig, OptimizerConfig
from nerf_kinematics_tpu.train.ngp_engine import NGPEngine


def test_occupancy_training_loop():
    ds = make_synthetic_scene(n_views=6, resolution=24)
    cfg = Config(
        engine="ngp",
        ngp=NGPConfig(
            encoder="cp",
            cp=CPGridConfig(n_levels=2, n_components=8, base_resolution=16,
                            max_resolution=64, table_size=32),
            density_width=16, density_layers=2, color_width=16, color_layers=2,
            use_occupancy=True, occ_resolution=16, occ_update_every=10,
        ),
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=24, num_fine=0, perturb=True),
            validation=RenderSettings(num_coarse=24, num_fine=0, perturb=False),
            num_random_rays=256,
        ),
        optimizer=OptimizerConfig(lr=1e-2),
    )
    engine = NGPEngine(cfg, scene_bound=1.0)
    state = engine.init_state(0)
    assert state.aux is not None and state.aux.resolution == 16

    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far, False, donate=False)
    images, poses = jnp.asarray(ds.images), jnp.asarray(ds.poses)

    losses = []
    for i in range(40):
        state, m = step(state, images, poses)
        losses.append(float(m["loss"]))
        if (i + 1) % 10 == 0:
            old = np.asarray(state.aux.density).copy()
            state = engine.update_occupancy(state)
            new = np.asarray(state.aux.density)
            assert new.shape == old.shape
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # After updates the grid is no longer the all-ones init.
    assert not np.allclose(np.asarray(state.aux.density), 1.0)
