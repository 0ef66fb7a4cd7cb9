"""Fused point-pipeline kernel (ops/ngp_fused_pallas.py) parity tests:
values and every parameter gradient must match the unfused flax module
(cp_pallas encoder + Dense MLPs) — interpret mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kinematics_tpu.models.ngp import NGPConfig, NGPModel
from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig
from nerf_kinematics_tpu.train.config import Config
from nerf_kinematics_tpu.train.ngp_engine import NGPEngine


def _cfg(use_bf16=False, fused="on"):
    return NGPConfig(
        encoder="cp_pallas",
        cp=CPGridConfig(n_levels=3, n_components=16, base_resolution=8,
                        max_resolution=64, table_size=48, use_bf16=use_bf16),
        density_width=32, density_layers=3, density_out=16,
        color_width=32, color_layers=3, sh_degree=4,
        fused=fused,
    )


def _engines():
    cfg_f = Config(engine="ngp", ngp=_cfg(fused="on"))
    cfg_u = Config(engine="ngp", ngp=_cfg(fused="off"))
    e_f = NGPEngine(cfg_f, scene_bound=1.0)
    e_u = NGPEngine(cfg_u, scene_bound=1.0)
    assert e_f.fused and not e_u.fused
    state = e_f.init_state(0)
    return e_f, e_u, state.params["coarse"]


def test_fused_matches_unfused_forward():
    e_f, e_u, params = _engines()
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (97, 3), minval=-1.0, maxval=1.0)
    vd = jax.random.normal(key, (97, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    rgb_f, sig_f = e_f.apply_coarse(params, pts, vd)
    rgb_u, sig_u = e_u.apply_coarse(params, pts, vd)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_u),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sig_f), np.asarray(sig_u),
                               rtol=2e-5, atol=2e-5)


def test_fused_matches_unfused_gradients():
    e_f, e_u, params = _engines()
    key = jax.random.PRNGKey(2)
    pts = jax.random.uniform(key, (64, 3), minval=-1.0, maxval=1.0)
    vd = jax.random.normal(key, (64, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    tgt = jax.random.uniform(key, (64, 3))

    def loss(engine):
        def f(p):
            rgb, sigma = engine.apply_coarse(p, pts, vd)
            return (jnp.mean((jax.nn.sigmoid(rgb) - tgt) ** 2)
                    + 1e-3 * jnp.mean(jnp.log1p(sigma)))
        return f

    g_f = jax.grad(loss(e_f))(params)
    g_u = jax.grad(loss(e_u))(params)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_u = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_u)}
    assert flat_f, "no gradient leaves"
    for k, v in flat_f:
        ks = jax.tree_util.keystr(k)
        ref = flat_u[ks]
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref), rtol=5e-4, atol=5e-6,
            err_msg=f"gradient mismatch at {ks}",
        )
        # Parameters must actually receive gradient (not silently zero).
        if "bias" not in ks:
            assert np.abs(np.asarray(v)).max() > 0, f"zero grad at {ks}"


def test_fused_batch_shapes_and_padding():
    e_f, e_u, params = _engines()
    key = jax.random.PRNGKey(3)
    # Ragged count (not a multiple of the 512 block) and extra batch dims.
    pts = jax.random.uniform(key, (7, 13, 3))
    vd = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), pts.shape)
    rgb, sigma = e_f.apply_coarse(params, pts, vd)
    assert rgb.shape == (7, 13, 3) and sigma.shape == (7, 13)
    rgb_u, sig_u = e_u.apply_coarse(params, pts, vd)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_u),
                               rtol=2e-5, atol=2e-5)


def test_fused_training_step_converges():
    from nerf_kinematics_tpu.data import make_synthetic_scene
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings
    from nerf_kinematics_tpu.train.config import NeRFConfig, OptimizerConfig

    ds = make_synthetic_scene(n_views=6, resolution=24)
    cfg = Config(
        engine="ngp", ngp=_cfg(fused="on"),
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=24, num_fine=0, perturb=True),
            validation=RenderSettings(num_coarse=24, num_fine=0,
                                      perturb=False),
            num_random_rays=256,
        ),
        optimizer=OptimizerConfig(lr=5e-3),
    )
    engine = NGPEngine(cfg, scene_bound=1.0)
    state = engine.init_state(0)
    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far, False,
                                  donate=False)
    images, poses = jnp.asarray(ds.images), jnp.asarray(ds.poses)
    losses = []
    for _ in range(60):
        state, m = step(state, images, poses)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])


def test_cf_render_path_matches_channels_last():
    """render_rays through the channels-first composite (apply_cf +
    raw2outputs_cf) must match the classic channels-last path bitwise-ish
    on the same parameters — the cf path is a layout change, not a math
    change."""
    from nerf_kinematics_tpu.rendering.renderer import render_rays

    e_f, e_u, params = _engines()
    key = jax.random.PRNGKey(9)
    n = 33
    rays_o = jnp.zeros((n, 3)).at[:, 2].set(-2.0)
    rd = jax.random.normal(key, (n, 3)) * 0.1 + jnp.array([0.0, 0.0, 1.0])
    rays_d = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    from nerf_kinematics_tpu.rendering.renderer import RenderSettings

    settings = RenderSettings(num_coarse=16, num_fine=16, perturb=False,
                              merge_hierarchical=False,
                              white_background=True)
    cf_c, cf_f = e_f.cf_apply_fns()
    assert cf_c is not None
    coarse_cf, fine_cf = render_rays(
        params, e_f.apply_coarse, rays_o, rays_d, 0.5, 3.5, settings,
        key=key, apply_fine=e_f.apply_fine, use_viewdirs=True,
        apply_coarse_cf=cf_c, apply_fine_cf=cf_f,
    )
    coarse_cl, fine_cl = render_rays(
        params, e_u.apply_coarse, rays_o, rays_d, 0.5, 3.5, settings,
        key=key, apply_fine=e_u.apply_fine, use_viewdirs=True,
    )
    for a, b, name in [
        (coarse_cf.rgb, coarse_cl.rgb, "coarse rgb"),
        (coarse_cf.weights, coarse_cl.weights, "coarse weights"),
        (fine_cf.rgb, fine_cl.rgb, "fine rgb"),
        (fine_cf.depth, fine_cl.depth, "fine depth"),
        (fine_cf.acc, fine_cl.acc, "fine acc"),
    ]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
            err_msg=name,
        )


def test_fused_hash_fold_matches_unfused():
    """fold="hash" through the whole engine pipeline: fused kernel vs the
    unfused flax module, forward and parameter gradients."""
    def _hcfg(fused):
        base = _cfg(fused=fused)
        return dataclasses.replace(
            base, cp=dataclasses.replace(base.cp, fold="hash"))

    e_f = NGPEngine(Config(engine="ngp", ngp=_hcfg("on")), scene_bound=1.0)
    e_u = NGPEngine(Config(engine="ngp", ngp=_hcfg("off")), scene_bound=1.0)
    params = e_f.init_state(0).params["coarse"]
    key = jax.random.PRNGKey(7)
    pts = jax.random.uniform(key, (65, 3), minval=-1.0, maxval=1.0)
    vd = jax.random.normal(key, (65, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    rgb_f, sig_f = e_f.apply_coarse(params, pts, vd)
    rgb_u, sig_u = e_u.apply_coarse(params, pts, vd)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_u),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sig_f), np.asarray(sig_u),
                               rtol=2e-5, atol=2e-5)

    def loss_f(p):
        r, s = e_f.apply_coarse(p, pts, vd)
        return (r ** 2).mean() + (s ** 2).mean()

    def loss_u(p):
        r, s = e_u.apply_coarse(p, pts, vd)
        return (r ** 2).mean() + (s ** 2).mean()

    gf = jax.grad(loss_f)(params)
    gu = jax.grad(loss_u)(params)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_u = dict(jax.tree_util.tree_leaves_with_path(gu))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_u[path]), rtol=5e-3, atol=5e-4,
            err_msg=str(path))


def test_block_clamp_small_inputs():
    """_block_for caps the point-block at the padded input width so small
    calls don't pad to the 4096-point training block, and results are
    invariant to the requested block size."""
    from nerf_kinematics_tpu.ops.ngp_fused_pallas import (
        _block_for,
        ngp_fused_apply_cf,
    )

    assert _block_for(100, 4096) == 128
    assert _block_for(1024, 4096) == 1024
    assert _block_for(1030, 4096) == 1152  # rounds up to the lane tile
    assert _block_for(100000, 4096) == 4096

    cfg = _cfg(fused="on")
    e_f, _, params = _engines()
    raw = e_f._fused_params(params)
    key = jax.random.PRNGKey(3)
    xt = jax.random.uniform(key, (3, 300))
    vd = jax.random.normal(key, (3, 300))
    vd = vd / jnp.linalg.norm(vd, axis=0, keepdims=True)
    out_small = ngp_fused_apply_cf(raw, xt, vd, cfg.cp, 256, True)
    out_big = ngp_fused_apply_cf(raw, xt, vd, cfg.cp, 4096, True)
    np.testing.assert_allclose(np.asarray(out_small), np.asarray(out_big),
                               rtol=1e-6, atol=1e-6)


def test_sigma_only_kernel_matches_full():
    """Density-only forward: row 3 identical to the full kernel, rgb rows
    zero — the proposal-only coarse pass contract."""
    from nerf_kinematics_tpu.ops.ngp_fused_pallas import (
        ngp_fused_apply_cf,
        ngp_fused_sigma_cf,
    )

    cfg = _cfg(fused="on")
    e_f, _, params = _engines()
    raw = e_f._fused_params(params)
    key = jax.random.PRNGKey(7)
    xt = jax.random.uniform(key, (3, 300))
    vd = jax.random.normal(key, (3, 300))
    vd = vd / jnp.linalg.norm(vd, axis=0, keepdims=True)
    full = ngp_fused_apply_cf(raw, xt, vd, cfg.cp, 256, True)
    sig = ngp_fused_sigma_cf(raw, xt, cfg.cp, 256, True)
    np.testing.assert_allclose(np.asarray(sig[3]), np.asarray(full[3]),
                               rtol=1e-6, atol=1e-6)
    assert not np.any(np.asarray(sig[0:3]))


def test_fused_fold_cap_grads_match_unfused():
    """F < table_size dup-row path: with fold_cap the wrap row sits INSIDE
    the parameter table (a dead row of its own level) — fold_dlines must
    route the wrap gradient to row 0 and leave the dead row at zero."""
    from nerf_kinematics_tpu.train.config import Config

    def cfgs(fused):
        c = NGPConfig(
            encoder="cp_pallas",
            cp=CPGridConfig(n_levels=3, n_components=16, base_resolution=8,
                            max_resolution=64, table_size=48, fold_cap=32,
                            use_bf16=False),
            density_width=32, density_layers=3, density_out=16,
            color_width=32, color_layers=3, sh_degree=4,
            fused=fused,
        )
        return Config(engine="ngp", ngp=c)

    e_f = NGPEngine(cfgs("on"), scene_bound=1.0)
    e_u = NGPEngine(cfgs("off"), scene_bound=1.0)
    params = e_f.init_state(0).params["coarse"]
    # fold_cap=32 < table_size=48: the R=64 level folds into 32 rows,
    # exercising the F < T branch of fold_dlines.
    assert e_f.ngp_config.cp.level_fold(64) == 32 < 48

    key = jax.random.PRNGKey(11)
    pts = jax.random.uniform(key, (64, 3), minval=-1.0, maxval=1.0)
    vd = jax.random.normal(key, (64, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    tgt = jax.random.uniform(key, (64, 3))

    def loss(engine):
        def f(p):
            rgb, sigma = engine.apply_coarse(p, pts, vd)
            return (jnp.mean((jax.nn.sigmoid(rgb) - tgt) ** 2)
                    + 1e-3 * jnp.mean(jnp.log1p(sigma)))
        return f

    g_f = jax.grad(loss(e_f))(params)
    g_u = jax.grad(loss(e_u))(params)
    flat_u = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_u)}
    for k, v in jax.tree_util.tree_leaves_with_path(g_f):
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_u[ks]), rtol=5e-4, atol=5e-6,
            err_msg=f"gradient mismatch at {ks}",
        )
