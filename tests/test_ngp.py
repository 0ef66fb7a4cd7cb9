"""NGP model + engine tests: architecture parity with the reference's logged
network, and convergence on the synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kinematics_tpu.data import make_synthetic_scene
from nerf_kinematics_tpu.models.ngp import NGPConfig, NGPModel
from nerf_kinematics_tpu.ops.hashgrid import HashGridConfig
from nerf_kinematics_tpu.rendering.renderer import RenderSettings
from nerf_kinematics_tpu.train.config import Config, NeRFConfig, OptimizerConfig, config_from_dict
from nerf_kinematics_tpu.train.ngp_engine import NGPEngine


def _small_ngp():
    return NGPConfig(
        grid=HashGridConfig(n_levels=4, n_features=2, log2_table_size=12,
                            base_resolution=4, max_resolution=64),
        density_width=32, density_layers=2, color_width=32, color_layers=2,
    )


def test_reference_architecture_param_count():
    """Full-size hash model: network params = 10,240 (cell 23: density 64x3 +
    color 64x4 with 32-dim inputs, no biases in tcnn's count... our Dense
    layers add biases; compare kernel-only count)."""
    model = NGPModel(NGPConfig(encoder="hash"))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    kernels = {
        k: v["kernel"].size
        for k, v in params["params"].items()
        if isinstance(v, dict) and "kernel" in v
    }
    # density: 32*64 + 64*64 + 64*16 = 7168; color: 32*64 + 64*64*2 + 64*3 = 10432.
    assert sum(kernels.values()) == 7168 + 10432
    table = params["params"]["hash_table"]
    assert table.shape == (8, 524288, 4)


def test_density_positive_and_view_independent():
    model = NGPModel(_small_ngp())
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)), jnp.zeros((2, 3)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
    _, s1 = model.apply(params, x, jnp.tile(jnp.array([0.0, 0.0, 1.0]), (8, 1)))
    _, s2 = model.apply(params, x, jnp.tile(jnp.array([1.0, 0.0, 0.0]), (8, 1)))
    assert (np.asarray(s1) > 0).all()  # exp activation
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_ngp_engine_converges_on_synthetic():
    ds = make_synthetic_scene(n_views=9, resolution=32)
    cfg = Config(
        engine="ngp",
        ngp=_small_ngp(),
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=32, num_fine=32, perturb=True),
            validation=RenderSettings(num_coarse=32, num_fine=32, perturb=False),
            num_random_rays=512,
        ),
        optimizer=OptimizerConfig(lr=5e-3),
    )
    engine = NGPEngine(cfg, scene_bound=1.0)
    state = engine.init_state(0)
    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far, False, donate=False)
    images, poses = jnp.asarray(ds.images), jnp.asarray(ds.poses)
    losses = []
    for _ in range(100):
        state, m = step(state, images, poses)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_ngp_yaml_engine_selection():
    cfg = config_from_dict(
        {
            "engine": "ngp",
            "ngp": {"n_levels": 4, "n_features": 2, "density_width": 32},
            "nerf": {"train": {"num_coarse": 16}},
        }
    )
    assert cfg.engine == "ngp"
    assert cfg.ngp.grid.n_levels == 4
    assert cfg.ngp.density_width == 32


def test_density_grid_query():
    cfg = Config(engine="ngp", ngp=_small_ngp())
    engine = NGPEngine(cfg, scene_bound=1.0)
    state = engine.init_state(0)
    grid = engine.density_grid(state.params, resolution=8)
    assert grid.shape == (8, 8, 8)
    assert (np.asarray(grid) > 0).all()


def test_encoder_auto_resolves_to_cp_on_cpu():
    cfg = NGPConfig(encoder="auto")
    assert cfg.resolved_encoder() == "cp"  # tests run on CPU
    model = NGPModel(NGPConfig(encoder="auto", cp=_small_ngp().cp))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    assert any(k.startswith("cp_lines") for k in params["params"])


def test_sigma_only_coarse_engagement():
    """cf_apply_fns drops to the density-only kernel exactly when the
    coarse pass is proposal-only (cw=0 AND fine passes exist), and keeps
    the full kernel when the coarse loss is live."""
    import dataclasses

    from nerf_kinematics_tpu.models.ngp import NGPConfig
    from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import Config, NeRFConfig
    from nerf_kinematics_tpu.train.ngp_engine import NGPEngine

    def cfg(cw):
        return Config(
            engine="ngp",
            ngp=NGPConfig(
                encoder="cp_pallas", fused="on",
                cp=CPGridConfig(n_levels=2, n_components=8,
                                base_resolution=4, max_resolution=16,
                                table_size=32),
            ),
            nerf=NeRFConfig(
                train=RenderSettings(num_coarse=4, num_fine=4),
                validation=RenderSettings(num_coarse=4, num_fine=4,
                                          perturb=False),
                coarse_loss_weight=cw,
            ),
        )

    eng0 = NGPEngine(cfg(0.0), scene_bound=1.0)
    c0, f0 = eng0.cf_apply_fns()
    assert c0 == eng0.apply_sigma_cf and f0 == eng0.apply_cf

    eng1 = NGPEngine(cfg(0.5), scene_bound=1.0)
    c1, f1 = eng1.cf_apply_fns()
    assert c1 == eng1.apply_cf and f1 == eng1.apply_cf


def test_flat_optimizer_matches_per_leaf():
    """optax.flatten(adam) is a layout change, not a math change: one update
    through the engine's flattened optimizer must equal the per-leaf
    chain(masked decay, adam) it replaced (see _make_optimizer)."""
    import optax

    cfg = Config(engine="ngp", ngp=_small_ngp(),
                 optimizer=OptimizerConfig(lr=5e-3))
    engine = NGPEngine(cfg, scene_bound=1.0)
    state = engine.init_state(0)
    params = state.params
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-3) + 0.1 * p, params
    )

    flat_tx = engine._make_optimizer(cfg)

    from nerf_kinematics_tpu.train.loop import lr_schedule

    sched = lr_schedule(cfg)
    adam = optax.adam(learning_rate=sched, b1=0.9, b2=0.99, eps=1e-15)

    def decay_mask(p):
        def keep(path, _):
            keys = [str(getattr(q, "key", "")) for q in path]
            if any(k == "hash_table" or k.startswith("cp_lines") for k in keys):
                return False
            return not (keys and keys[-1] == "bias")

        return jax.tree_util.tree_map_with_path(keep, p)

    leaf_tx = optax.chain(optax.add_decayed_weights(1e-6, mask=decay_mask), adam)

    p_flat, p_leaf = params, params
    s_flat, s_leaf = flat_tx.init(params), leaf_tx.init(params)
    for _ in range(3):
        u_flat, s_flat = flat_tx.update(grads, s_flat, p_flat)
        p_flat = optax.apply_updates(p_flat, u_flat)
        u_leaf, s_leaf = leaf_tx.update(grads, s_leaf, p_leaf)
        p_leaf = optax.apply_updates(p_leaf, u_leaf)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        ),
        p_flat, p_leaf,
    )
