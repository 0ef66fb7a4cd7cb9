"""One-invocation fused train objective (ops/ngp_fused_pallas
ngp_fused_train_cf + NGPEngine.fused_objective_fn) parity tests: the loss
AND every parameter gradient must match the autodiff path
(value_and_grad over render_rays + raw2outputs_cf) — interpret mode on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kinematics_tpu.data import make_synthetic_scene
from nerf_kinematics_tpu.models.ngp import NGPConfig
from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig
from nerf_kinematics_tpu.rendering.renderer import RenderSettings
from nerf_kinematics_tpu.train.config import Config, NeRFConfig
from nerf_kinematics_tpu.train.loop import build_shuffled_ray_buffer
from nerf_kinematics_tpu.train.ngp_engine import NGPEngine

N_RAYS = 256  # must be a multiple of the kernel's 128-ray block
N_FINE = 6


def _cfg(fused_train, use_occupancy=True, white_bg=True, n_rays=N_RAYS):
    return Config(
        engine="ngp",
        ngp=NGPConfig(
            encoder="cp_pallas",
            cp=CPGridConfig(n_levels=3, n_components=16, base_resolution=8,
                            max_resolution=32, table_size=48),
            density_width=32, density_layers=3, density_out=16,
            color_width=32, color_layers=3, sh_degree=4,
            fused="on", fused_train=fused_train,
            use_occupancy=use_occupancy, occ_resolution=16, occ_bins=8,
        ),
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=8, num_fine=N_FINE,
                                 white_background=white_bg),
            validation=RenderSettings(num_coarse=8, num_fine=N_FINE,
                                      perturb=False,
                                      white_background=white_bg),
            num_random_rays=n_rays,
            coarse_loss_weight=0.0,
        ),
    )


def _batch(n_rays=N_RAYS, seed=5):
    key = jax.random.PRNGKey(seed)
    k_o, k_d, k_t = jax.random.split(key, 3)
    rays_o = 0.1 * jax.random.normal(k_o, (n_rays, 3))
    rays_d = jax.random.normal(k_d, (n_rays, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    viewdirs = rays_d
    target = jax.random.uniform(k_t, (n_rays, 3))
    return rays_o, rays_d, viewdirs, target


def _loss_and_grads(engine, state, batch, key, near=0.5, far=3.0):
    obj = engine.fused_objective_fn(near, far, engine.cfg.nerf.train)
    if obj is not None:
        return obj(state.params, batch, key, state.aux)

    from nerf_kinematics_tpu.rendering.renderer import render_rays

    settings = engine.cfg.nerf.train

    def loss_fn(params):
        cf_c, cf_f = engine.cf_apply_fns()
        coarse, fine = render_rays(
            params["coarse"], engine.apply_coarse, batch[0], batch[1],
            near, far, settings, key=key, use_viewdirs=True,
            viewdirs=batch[2],
            proposal_fn=engine.proposal_for(state.aux, near, far, settings),
            apply_coarse_cf=cf_c, apply_fine_cf=cf_f,
        )
        loss_c = jnp.mean((coarse.rgb - batch[3]) ** 2)
        loss_f = jnp.mean((fine.rgb - batch[3]) ** 2)
        return loss_f, (loss_c, loss_f)

    return jax.value_and_grad(loss_fn, has_aux=True)(state.params)


@pytest.mark.parametrize("white_bg", [True, False])
@pytest.mark.parametrize("mode,use_occ", [
    ("on", True),    # fine-only kernel behind the XLA hull-proposal stage
    ("on", False),   # fine-only kernel behind the XLA stratified stage
    ("full", True),  # whole-step kernel (in-kernel hull + both CDFs)
])
def test_fused_objective_matches_autodiff(white_bg, mode, use_occ):
    e_on = NGPEngine(_cfg(mode, use_occupancy=use_occ, white_bg=white_bg),
                     scene_bound=1.0)
    e_off = NGPEngine(_cfg("off", use_occupancy=use_occ, white_bg=white_bg),
                      scene_bound=1.0)
    state = e_on.init_state(0)
    if use_occ:
        # Fill the occupancy grid from the fresh net so the hull proposal
        # actually shapes the coarse PDF (an all-zero grid degenerates to
        # the uniform floor and would under-exercise the CDF math).
        state = e_on.update_occupancy(state, full=True)
    batch = _batch()
    key = jax.random.PRNGKey(11)

    (loss_on, (lc_on, lf_on)), g_on = _loss_and_grads(e_on, state, batch, key)
    (loss_off, (lc_off, lf_off)), g_off = _loss_and_grads(
        e_off, state, batch, key
    )

    np.testing.assert_allclose(float(loss_on), float(loss_off),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(lc_on), float(lc_off),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(lf_on), float(lf_off),
                               rtol=1e-5, atol=1e-7)

    flat_on = jax.tree_util.tree_leaves_with_path(g_on)
    flat_off = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(g_off)}
    assert flat_on, "no gradient leaves"
    nonzero = 0
    for k, v in flat_on:
        ks = jax.tree_util.keystr(k)
        ref = flat_off[ks]
        assert v.shape == ref.shape, f"shape mismatch at {ks}"
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref), rtol=1e-3, atol=1e-6,
            err_msg=f"gradient mismatch at {ks}",
        )
        if np.abs(np.asarray(ref)).max() > 0:
            nonzero += 1
    assert nonzero >= 5, "too few live gradient leaves to trust parity"


def test_fused_objective_eligibility():
    near, far = 0.5, 3.0
    # Eligible flagship-shaped config → objective exists.
    e = NGPEngine(_cfg("auto"), scene_bound=1.0)
    assert e.fused_objective_fn(near, far, e.cfg.nerf.train) is not None
    # off → disabled even when eligible.
    e = NGPEngine(_cfg("off"), scene_bound=1.0)
    assert e.fused_objective_fn(near, far, e.cfg.nerf.train) is None
    # Ray count not a multiple of 128 → auto falls back...
    e = NGPEngine(_cfg("auto", n_rays=200), scene_bound=1.0)
    assert e.fused_objective_fn(near, far, e.cfg.nerf.train) is None
    # ...and "on" raises actionably.
    e = NGPEngine(_cfg("on", n_rays=200), scene_bound=1.0)
    with pytest.raises(ValueError, match="fused_train"):
        e.fused_objective_fn(near, far, e.cfg.nerf.train)
    # coarse loss weight > 0 → ineligible (coarse pass needs its backward).
    cfg = _cfg("auto")
    cfg = cfg.replace(nerf=dataclasses.replace(cfg.nerf,
                                               coarse_loss_weight=0.1))
    e = NGPEngine(cfg, scene_bound=1.0)
    assert e.fused_objective_fn(near, far, e.cfg.nerf.train) is None


def test_fused_train_step_trains():
    """End-to-end: the wired train step (loop.py) uses the fused objective
    and still learns — loss decreases, params move, state stays finite."""
    ds = make_synthetic_scene(n_views=4, resolution=16)
    cfg = _cfg("on")
    cfg = cfg.replace(dataset=dataclasses.replace(
        cfg.dataset, near=float(ds.near), far=float(ds.far)))
    engine = NGPEngine(cfg, scene_bound=1.0)
    state = engine.init_state(0)
    images = jnp.asarray(ds.images)
    poses = jnp.asarray(ds.poses)
    step = engine.make_train_step(ds.intrinsics, ds.near, ds.far, False,
                                  donate=False)
    ray_buf = None
    if cfg.nerf.train.pixel_sampler == "shuffled":
        ray_buf = build_shuffled_ray_buffer(images, poses, ds.intrinsics)
    losses = []
    for _ in range(10):
        state, m = step(state, images, poses, ray_buf)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
